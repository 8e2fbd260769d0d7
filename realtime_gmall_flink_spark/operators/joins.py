"""Join operators (SURVEY section 2.4).

The reference has four join shapes; all collapse to Catalyst joins:

- J1/J2 stream-stream equi-joins (order_detail x order_info x activity x
  coupon, DwdTradeOrderPreProcess.java:162-168) -> plain inner/left joins.
- J3/J4 temporal lookup joins against ``base_dic`` -> stream-static joins;
  in batch, broadcast hash joins of a small dict table (aliased twice when
  the same dim decodes two codes, DwdTradeOrderRefund.java:125-134).
- J5 async Redis/Phoenix point-lookup enrichment (DimAsyncFunction) ->
  set-oriented broadcast joins; the 6-hop cascade sku->spu->trademark->
  cat3->cat2->cat1 (DwsTradeTrademarkCategoryUserSpuOrderWindow.java:215-339)
  becomes a chain of broadcast joins — no per-row RPC, no thread pool.
- J6 broadcast config join -> operators.routing.

Scale: dims that fit in executor memory are explicitly ``broadcast()`` so
the 100 TB fact side never shuffles for enrichment; bigger dims fall back to
shuffle hash/sort-merge joins, which AQE will convert back to broadcast at
runtime if stats allow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    attrs: Sequence[tuple[str, str]],
    how: str = "left",
) -> DataFrame:
    """Dictionary-decode join: attach renamed dim attributes to the fact.

    ``attrs``: (dim_column, output_alias) pairs. The dim side is broadcast:
    a lookup table by definition fits on every executor.
    """
    d = dim.select(
        F.col(dim_key).alias("__dk"),
        *[F.col(c).alias(alias) for c, alias in attrs],
    )
    joined = fact.join(broadcast(d), fact[fact_key] == F.col("__dk"), how)
    return joined.drop("__dk")


def dim_cascade(
    fact: DataFrame,
    hops: Sequence[tuple[DataFrame, str, str, Sequence[tuple[str, str]]]],
) -> DataFrame:
    """Chained dimension enrichment — the Spark form of the reference's
    cascaded async lookups.

    Each hop: (dim_df, fact_key, dim_key, attrs) applied left-to-right; a
    hop's attrs may serve as the next hop's fact_key (sku -> spu -> ...).
    """
    out = fact
    for dim, fact_key, dim_key, attrs in hops:
        out = lookup_join(out, dim, fact_key, dim_key, attrs)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: each left row gets the LATEST right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``) per key —
    point-in-time enrichment (SCD lookups, last-event-before).

    Spark-first plan (no per-key Python, no range-join explosion): union
    both sides tagged, then one ``last(..., ignorenulls)`` window per
    right column over (key ORDER BY ts, tag). Right rows sort before
    left rows at equal ts for ``<=`` and after them for ``<``, so the
    running last-right-value IS the as-of match. One shuffle on the key,
    window runs in codegen; at 100 TB this is the join strategy that
    never materializes candidate pairs. ``tiebreak`` orders equal-ts
    right rows (latest wins) for determinism.
    """
    from pyspark.sql import Window

    right_tag = 2 if strict else 0
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    l_side = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r_side = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    order = [F.col("__ts"), F.col("__tag")]
    if tiebreak is not None:
        # nulls (left rows) sort first, so this only orders right rows
        order.append(F.col(f"__r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = l_side.unionByName(r_side)
    out = u.select(
        key,
        "__ts",
        "__tag",
        *lcols,
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"__m_{c}")
            for c in right_cols
        ],
    )
    return out.filter(F.col("__tag") == 1).select(
        key,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Flink ``intervalJoin`` analog: pairs where
    ``left_ts + lower <= right_ts <= left_ts + upper`` per key —
    inclusive on BOTH bounds, exactly like ``intervalJoin.between``
    (KeyedStream.IntervalJoined; a boundary-equal row joins). Compiles
    to a hash equi-join on the key with the range as a post-join filter
    — the right strategy when keys are selective (the common case);
    state-bounded in streaming by watermark + the interval width.
    """
    return left.join(
        right,
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}")),
    )
