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
