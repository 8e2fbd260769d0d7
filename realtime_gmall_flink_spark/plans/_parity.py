"""Shared determinism helpers for query/oracle parity.

Cross-engine floating-point hazards and their fixes:

- SUM over doubles depends on addition order (Spark partial aggregation vs
  DuckDB's scan order). Fix: sum in DECIMAL (exact, order-free), cast the
  exact result to double. ``dsum``/``DSUM_SQL``.
- AVG in Spark over decimals returns decimal with HALF_UP scale+4, DuckDB
  returns double. Fix: never AVG; divide the exact double sum by the count.
- Second-granularity diffs: Spark's timestampdiff truncates complete units,
  DuckDB's date_diff counts boundary crossings. Fix: diff in MICROSECOND,
  where both are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent double sum: exact decimal sum, then cast."""
    return F.sum(dec(col, scale)).cast("double")


def DSUM_SQL(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def dsum_product(a: Column | str, b: Column | str) -> Column:
    """Exact sum of 2-dec x 2-dec products (scale-4 decimal), as double."""
    return F.sum(dec(a) * dec(b)).cast("double")


def DSUM_PRODUCT_SQL(a: str, b: str) -> str:
    return (
        f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))"
        " AS DOUBLE)"
    )


def micros_between(start: Column, end: Column) -> Column:
    """Whole-microsecond difference (exact in both engines)."""
    return F.timestamp_diff("MICROSECOND", start, end)


def nearest_rank_target(total: str, p: int, floor_div: str = "div") -> str:
    """``ceil(p% of total)`` in exact integer arithmetic — the
    nearest-rank percentile threshold shared by the frequency-class
    entries (textops.vocab_coverage_curve, vectors.
    embedding_norm_percentiles). Never spell this with double division
    + ceil: a quotient one ulp off moves the ceil across an integer
    boundary and the two engines disagree. ``floor_div``: Spark spells
    integer division ``div``, DuckDB ``//``."""
    return f"({total} * {p} + 99) {floor_div} 100"
