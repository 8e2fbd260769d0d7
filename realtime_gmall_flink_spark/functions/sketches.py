"""Dedup sketches: word shingles, MinHash, SimHash.

Scale-path near-duplicate detection for the LLM-data-pipeline surface.
All sketches are built from md5 — available and bit-identical in both Spark
and DuckDB — so every operator here is oracle-checkable.

- MinHash: K independent hash functions are emulated as md5 over a
  seed-prefixed shingle; the per-doc signature is the lexicographic min hex
  digest per seed. Banding (LSH) concatenates adjacent signature slots;
  candidate pairs share at least one band. The O(n^2) pair space collapses
  to a shuffle on band values — at 100 TB each band bucket is tiny, and the
  band join is an equi-join Catalyst executes as a shuffled hash join.
- SimHash: per-bit +/-1 voting over each distinct token's md5 nibbles;
  near-dup = small Hamming distance (bit_count(xor)). The catalog runs the
  64-bit form (plans/textops.py) as 4 x 16-bit bands — pigeonhole makes
  hamming<=3 pairs share at least one identical band, so candidates come
  from an equi-join on (band, value) over a 2^16 key space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import tokenize


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined); empty array when the text
    has fewer than k tokens. JVM-side: split + transform over sequence."""
    toks = tokenize(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array().cast("array<string>"))


def minhash_hex(shingles: Column, seed: int) -> Column:
    """One MinHash slot: min md5 hex over seed-prefixed shingles (NULL for
    empty shingle sets)."""
    return F.array_min(
        F.transform(
            shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """Array of ``num_hashes`` MinHash slots."""
    return F.array(*[minhash_hex(shingles, i) for i in range(num_hashes)])


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: array of 'bandIdx:slot||slot' strings."""
    keys = []
    for b in range(bands):
        parts = [
            F.element_at(signature, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        keys.append(F.concat_ws("|", F.lit(str(b)), *parts))
    return F.array(*keys)
