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


def l2_squared(a: Column, b: Column) -> Column:
    """Squared euclidean distance — same left-to-right double fold
    contract as dot_product, so DuckDB's ``list_sum(list_transform(...))``
    over the identical per-element expression is bit-comparable."""
    return F.aggregate(
        F.zip_with(
            _as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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


def cosine_topk_arrow(
    emb,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Arrow/numpy brute-force cosine top-k: one BLAS matvec per Arrow
    batch, partial top-k per batch, global top-k over the tiny union.

    MEASURED: ~5x slower than the JVM fold (``cosine_similarity``) at
    400k x 64 vectors on local[32] — Arrow transfer of the list column
    dominates the cheap matvec, so the JVM expression path is the scale
    path for plain cosine. This pattern is retained for workloads where
    per-batch compute is heavy enough to amortize the transfer (GPU
    scoring, learned re-rankers). Float addition order also differs from
    the sequential fold (pairwise/SIMD), so results agree to float
    precision, not bit-exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    dim = len(query)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # flat concatenate + reshape: one C-level pass over the Arrow
            # list column instead of a Python-level conversion per row
            m = np.concatenate(pdf[vec_col].to_numpy()).reshape(-1, dim)
            m = m.astype(np.float64, copy=False)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            top = np.argsort(-sims, kind="stable")[:k]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[top],
                    "cos_sim": sims[top],
                }
            )

    partial = emb.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, cos_sim double"
    )
    return (
        partial.select(id_col, F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
