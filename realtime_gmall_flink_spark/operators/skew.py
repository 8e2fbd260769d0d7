"""Skew handling: salted two-stage aggregation.

AQE's skew-join splitting covers joins, but a groupBy whose key
distribution is pathological (one key holding a large share of 100 TB)
still funnels one reducer. The classic fix: salt the key, pre-aggregate on
(key, salt), then merge partials on the key — two small shuffles instead of
one hot one. Works for algebraic aggregates (sum/count/min/max; avg as
sum+count); distinct-counts at scale should use approx_count_distinct,
which is algebraic over HLL sketches.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge function per partial-agg output for the final stage
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output name -> (fn, column)
    with fn in {sum, count, min, max}.

    Example: salted_agg(df, ["k"], {"total": ("sum", "v"),
    "rows": ("count", "*")}) == df.groupBy("k").agg(sum(v), count(*))
    but with the heavy shuffle spread over ``buckets`` salt values.
    """
    # deterministic row-spread without rand(): partition-monotonic ids mod
    # the bucket count scatter each hot key across ~buckets reducers
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets))

    partial_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        src = F.lit(1) if col == "*" else F.col(col)
        if fn == "count":
            partial_exprs.append(F.count(src).alias(f"__p_{name}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(src).alias(f"__p_{name}"))
        elif fn == "min":
            partial_exprs.append(F.min(src).alias(f"__p_{name}"))
        elif fn == "max":
            partial_exprs.append(F.max(src).alias(f"__p_{name}"))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
    )
    final_exprs = [
        _MERGE[fn](F.col(f"__p_{name}")).alias(name)
        for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    buckets: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the small side does NOT fit in a
    broadcast and one key dominates the big side: salt the skewed side's
    rows (deterministic id-mod, no rand()), REPLICATE the other side once
    per salt value (explode over 0..buckets-1), and equi-join on
    (key, salt). The hot key's rows land on ``buckets`` reducers instead
    of one. Costs buckets x |other| on the replicated side — use after
    broadcast is ruled out and AQE's runtime skew split isn't available
    (e.g. streaming-static joins, bucketed-table joins that must keep
    their partitioning).

    ``how`` supports inner/left (left = the skewed side's nulls survive,
    as in a plain left join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )
    out = left.join(right, [*on, "__salt"], how)
    return out.drop("__salt")
