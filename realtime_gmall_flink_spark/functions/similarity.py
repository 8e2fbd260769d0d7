"""Vector similarity over embedding columns (array<float>).

Brute-force cosine is the correctness baseline; the scale path buckets
vectors with a deterministic sign-LSH so candidate generation becomes an
equi-join on bucket id instead of a cross join. All arithmetic is JVM-side
(``aggregate``/``zip_with`` fold left-to-right in array order, which makes
double-precision results reproducible and oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _as_double(v), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def sign_lsh_bucket(v: Column, bits: int = 8) -> Column:
    """Deterministic sign-LSH: bit i set when v[2i+1] > v[2i+2] (1-based
    element_at). Parameter-free (no random hyperplanes), identical in SQL,
    and good enough to shrink candidate sets by ~2^bits."""
    bucket = F.lit(0)
    for i in range(bits):
        gt = F.element_at(v, 2 * i + 1) > F.element_at(v, 2 * i + 2)
        bucket = bucket + F.when(gt, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def probe_masks(bits: int, radius: int) -> list[int]:
    """All XOR masks with at most ``radius`` of ``bits`` set — the
    multi-probe neighborhood. A vector whose bucket differs from a query's
    in <= radius bit positions is reached by exactly one mask, so a probe
    equi-join finds each hamming<=radius pair exactly once (no DISTINCT).
    Sizes: radius 1 -> bits+1 masks, radius 2 -> 1+bits+C(bits,2)."""
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(bits)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(bits)
            for j in range(i + 1, bits)
        ]
    if radius >= 3:
        raise ValueError("probe radius > 2 not supported (mask set blows up)")
    return masks
