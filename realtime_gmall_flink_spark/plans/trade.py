"""Trade-side queries over the TPC-H-ish tables.

Re-express the reference's db-side DWD fact derivation and trade DWS
aggregations (SURVEY 2.4 J1-J5, 2.5 A4/A7, 2.9) on orders/lineitem/
customer/nation/region/part/supplier: order_info ~ orders, order_detail ~
lineitem, base_province ~ nation, the sku->spu->trademark->category cascade
~ customer->nation->region. Plus two TPC-H classics as bench headliners.

Join strategy at scale: dimension sides (customer at this ratio, nation,
region, part, supplier) are broadcast so the fact table never shuffles for
enrichment; the lineitem-orders join shuffles on the join key once and AQE
may still convert it to broadcast at lower SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.joins import dim_cascade, lookup_join
from ..sources.testdata import load_table
from ._parity import dec, dsum, DSUM_SQL
from .catalog import register

# Exact revenue: decimal product of 2-dec price and (1 - 2-dec discount),
# summed exactly, surfaced as double.
_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


def _revenue() -> F.Column:
    one = F.lit(1).cast("decimal(18,2)")
    return F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast(
        "double"
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 — pricing summary (scan + filter + hash agg; whole-stage codegen
# path; the bench's scan/agg headliner)
@register(
    "tpch_q1",
    survey="P7,A4",
    headline=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {DSUM_SQL('l_quantity')} AS sum_qty,
       {DSUM_SQL('l_extendedprice')} AS sum_base_price,
       {_REV_SQL} AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       {DSUM_SQL('l_quantity')} / count(*) AS avg_qty,
       {DSUM_SQL('l_extendedprice')} / count(*) AS avg_price,
       {DSUM_SQL('l_discount')} / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            _revenue().alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (one - dec("l_discount"))
                * (one + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (dsum("l_quantity") / cnt).alias("avg_qty"),
            (dsum("l_extendedprice") / cnt).alias("avg_price"),
            (dsum("l_discount") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-style — join + agg + deterministic top-k (sort/limit)
@register(
    "tpch_q3_top_orders",
    survey="J1,A7",
    headline=True,
    oracle=f"""
SELECT l_orderkey, {_REV_SQL} AS revenue, o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"], "inner"
        )
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J1/J3/J4 — detail-grain fact enrichment; the same dim (nation) joined
# twice under different keys, like base_dic as type_dic/reason_dic
# (DwdTradeOrderRefund.java:125-134)
@register(
    "order_detail_enriched",
    survey="J1,J3,J4,P3",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
       c_name, cn.n_name AS cust_nation,
       s_name, sn.n_name AS supp_nation
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
""",
)
def order_detail_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    fact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
    # inner lookup joins: FK integrity holds in this schema, and the oracle's
    # plain JOINs are inner; lookup_join defaults to left for dirty data.
    fact = lookup_join(
        fact, cust, "o_custkey", "c_custkey",
        [("c_name", "c_name"), ("c_nationkey", "__c_nk")], how="inner",
    )
    fact = lookup_join(
        fact, nation, "__c_nk", "n_nationkey",
        [("n_name", "cust_nation")], how="inner",
    )
    fact = lookup_join(
        fact, supp, "l_suppkey", "s_suppkey",
        [("s_name", "s_name"), ("s_nationkey", "__s_nk")], how="inner",
    )
    fact = lookup_join(
        fact, nation, "__s_nk", "n_nationkey",
        [("n_name", "supp_nation")], how="inner",
    )
    return fact.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double")
        .alias("net_price"),
        "c_name",
        "cust_nation",
        "s_name",
        "supp_nation",
    )


# ---------------------------------------------------------------------------
# J5 — cascaded dimension enrichment + rollup (the 6-hop trademark/category
# cascade of DwsTradeTrademarkCategoryUserSpuOrderWindow.java:215-339,
# expressed as customer -> nation -> region broadcast hops)
@register(
    "dim_cascade_region_revenue",
    survey="J5,A7,A1",
    headline=True,
    oracle=f"""
SELECT r_name, n_name,
       count(DISTINCT o_orderkey) AS order_ct,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def dim_cascade_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
    fact = dim_cascade(
        fact,
        [
            (
                load_table(spark, sf_dir, "customer"),
                "o_custkey",
                "c_custkey",
                [("c_nationkey", "__nk")],
            ),
            (
                load_table(spark, sf_dir, "nation"),
                "__nk",
                "n_nationkey",
                [("n_name", "n_name"), ("n_regionkey", "__rk")],
            ),
            (
                load_table(spark, sf_dir, "region"),
                "__rk",
                "r_regionkey",
                [("r_name", "r_name")],
            ),
        ],
    )
    return fact.groupBy("r_name", "n_name").agg(
        F.countDistinct("o_orderkey").alias("order_ct"),
        _revenue().alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A4/A6 — per-day order window with unique and first-time (new) users
# (dws_trade_order_window, DwsTradeOrderWindow.java:183-303)
@register(
    "trade_order_window",
    survey="A4,A6,W1,P7",
    headline=True,
    oracle=f"""
WITH o AS (
    SELECT o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date,
           min(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey) AS first_date
    FROM orders
)
SELECT order_date,
       count(*) AS order_ct,
       count(DISTINCT o_custkey) AS order_user_ct,
       count(DISTINCT CASE WHEN order_date = first_date
                           THEN o_custkey END) AS new_user_ct,
       {DSUM_SQL('o_totalprice')} AS amount_sum
FROM o GROUP BY order_date
""",
)
def trade_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey")
    o = orders.select(
        "o_custkey",
        "o_totalprice",
        od.alias("order_date"),
        F.min(od).over(w).alias("first_date"),
    )
    return o.groupBy("order_date").agg(
        F.count(F.lit(1)).alias("order_ct"),
        F.countDistinct("o_custkey").alias("order_user_ct"),
        F.countDistinct(
            F.when(F.col("order_date") == F.col("first_date"), F.col("o_custkey"))
        ).alias("new_user_ct"),
        dsum("o_totalprice").alias("amount_sum"),
    )


# ---------------------------------------------------------------------------
# A7 — distinct-order count per province(nation), dim joined AFTER the
# aggregation exactly like the reference's post-agg join
# (dws_trade_province_order_window, DwsTradeProvinceOrderWindow.java:153-253)
@register(
    "province_order_window",
    survey="A7,J5,A1",
    oracle=f"""
WITH agg AS (
    SELECT c_nationkey,
           count(DISTINCT o_orderkey) AS order_ct,
           {DSUM_SQL('o_totalprice')} AS order_amount
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
)
SELECT c_nationkey AS province_id, n_name AS province_name,
       order_ct, order_amount
FROM agg JOIN nation ON c_nationkey = n_nationkey
""",
)
def province_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        orders.join(
            broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
            "inner",
        )
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("o_orderkey").alias("order_ct"),
            dsum("o_totalprice").alias("order_amount"),
        )
    )
    # Post-aggregation dim join: rows are already reduced to one per nation.
    enriched = lookup_join(
        agg, nation, "c_nationkey", "n_nationkey",
        [("n_name", "province_name")], how="inner",
    )
    return enriched.select(
        F.col("c_nationkey").alias("province_id"),
        "province_name",
        "order_ct",
        "order_amount",
    )


# ---------------------------------------------------------------------------
# multi-dim group (trademark x category analog: brand x type)
# (dws_trade_trademark_category_user_spu_order_window)
@register(
    "brand_type_order_window",
    survey="A7,J5",
    oracle=f"""
SELECT p_brand, p_type,
       count(DISTINCT l_orderkey) AS order_ct,
       {DSUM_SQL('l_quantity')} AS qty_sum,
       {_REV_SQL} AS amount_sum
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
""",
)
def brand_type_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_orderkey").alias("order_ct"),
            dsum("l_quantity").alias("qty_sum"),
            _revenue().alias("amount_sum"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-style — cyclic join: customer and supplier must share a nation
# (an equality constraint BETWEEN two dimension legs, not just fact->dim)
@register(
    "tpch_q5_local_supplier",
    survey="J1,J4,A7",
    oracle=f"""
SELECT n_name, {_REV_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    fact = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(
            broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
        )
    )
    return fact.groupBy("n_name").agg(_revenue().alias("revenue"))


# ---------------------------------------------------------------------------
# Beyond the reference (SURVEY 2.4/2.5 note semi/anti joins and
# rollup/cube are absent there): both are native Spark and standard
# warehouse asks, so the engine ships them oracle-checked.
@register(
    "parts_never_bulk_ordered",
    survey="J+(anti/semi)",
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE p_partkey NOT IN (
    SELECT l_partkey FROM lineitem WHERE l_extendedprice > 90000
)
""",
)
def parts_never_bulk_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bulk = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 90000
    )
    return part.join(
        bulk, part["p_partkey"] == bulk["l_partkey"], "left_anti"
    ).select("p_partkey", "p_brand")


@register(
    "revenue_rollup",
    survey="A+(rollup)",
    oracle=f"""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    fact = dim_cascade(
        fact,
        [
            (load_table(spark, sf_dir, "customer"), "o_custkey",
             "c_custkey", [("c_nationkey", "__nk")]),
            (load_table(spark, sf_dir, "nation"), "__nk", "n_nationkey",
             [("n_name", "n_name"), ("n_regionkey", "__rk")]),
            (load_table(spark, sf_dir, "region"), "__rk", "r_regionkey",
             [("r_name", "r_name")]),
        ],
    )
    return (
        fact.rollup("r_name", "n_name")
        .agg(_revenue().alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# refund analog — returned lineitems per brand
# (dws_trade_trademark_category_user_refund_window)
@register(
    "brand_refund_window",
    survey="A7,P4,P7",
    oracle=f"""
SELECT p_brand,
       count(DISTINCT l_orderkey) AS refund_order_ct,
       {DSUM_SQL('l_extendedprice')} AS refund_amount
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag = 'R'
GROUP BY p_brand
""",
)
def brand_refund_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_orderkey").alias("refund_order_ct"),
            dsum("l_extendedprice").alias("refund_amount"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4-style — EXISTS semi-join: orders with at least one lineitem
# shipped after the order date, counted by priority. The semi-join keeps
# the probe side single-pass (no fact duplication, no distinct needed);
# Catalyst plans a shuffled hash semi on the equality key with the date
# predicate applied inside the join.
@register(
    "tpch_q4_order_priority",
    survey="J+(semi)",
    oracle="""
SELECT o_orderpriority, count(*) AS order_ct
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_ct"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-style — promo revenue share per ship year: conditional decimal
# aggregate (P5 over money) against the part dim, broadcast.
@register(
    "tpch_q14_promo_revenue",
    survey="P5,A4,J5",
    oracle=f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) END),
            0) AS DOUBLE) AS promo_revenue,
       {_REV_SQL} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,2)")
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p_type") == "PROMO", rev)), F.lit(0)
            )
            .cast("double")
            .alias("promo_revenue"),
            _revenue().alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7-style — volume shipping: the SAME dim (nation) joined twice
# under different roles (J4) with an inequality between the legs, bucketed
# by ship year. Both nation legs broadcast; the fact shuffles only for the
# orders join and the final aggregate.
@register(
    "tpch_q7_volume_shipping",
    survey="J1,J4,A4",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       {_REV_SQL} AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    fact = (
        li.join(broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return fact.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(_revenue().alias("volume"))


# ---------------------------------------------------------------------------
# TPC-H Q18-style — large-volume orders: a HAVING-filtered aggregate used
# as a semi-join filter on the fact. The qualifying-keys side is itself an
# aggregate (not a dim), so both sides shuffle on orderkey and the filter
# join is a shuffled left-semi on the SAME key — Catalyst reuses the
# partitioning, no extra exchange for the semi probe.
@register(
    "tpch_q18_large_orders",
    survey="J+(semi),A4,A7",
    oracle=f"""
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {DSUM_SQL('l_quantity')} AS total_qty
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
GROUP BY 1, 2, 3
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big, orders["o_orderkey"] == big["l_orderkey"], "left_semi"
        )
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10-style — returned-item revenue: which customers returned the
# most in a quarter. Fact-fact shuffle join on orderkey (both sides
# filtered first, so the shuffle moves only the quarter's orders and the
# 'R' lines), then broadcast customer+nation enrich AFTER the per-customer
# aggregate would be wrong (c_name is a group key), so the dims broadcast
# onto the fact pre-agg — still no large shuffle beyond orderkey/custkey.
@register(
    "tpch_q10_returned_revenue",
    survey="J1,J5,A4",
    oracle=f"""
SELECT c_custkey, c_name, {_REV_SQL} AS revenue, c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6-style — forecasting revenue change: pure scan + pushed filters
# + one global exact-decimal sum; no join, no per-key shuffle at all (a
# single partial/final agg). The canonical "is the scan path fast" probe.
@register(
    "tpch_q6_revenue_change",
    survey="P7,A4",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS line_ct
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._parity import dsum_product

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & dec("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum_product("l_extendedprice", "l_discount").alias("revenue"),
        F.count(F.lit(1)).alias("line_ct"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q12-style — late-shipment accounting per order priority (the
# testdata lineitem carries no shipmode/commitdate, so lateness is
# l_shipdate > o_orderdate + 90 days — the same join + conditional-count
# shape). Interval compare is a direct timestamp comparison (no unit
# truncation to diverge between engines).
@register(
    "shipment_lateness_by_priority",
    survey="J1,P5,A4",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_ct,
       count(*) AS line_ct,
       round(CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4
             ) AS late_share
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def shipment_lateness_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        1,
    ).otherwise(0)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_ct"),
            F.count(F.lit(1)).alias("line_ct"),
            F.round(
                F.sum(late).cast("double") / F.count(F.lit(1)), 4
            ).alias("late_share"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE — all 2^k grouping-set combinations in one pass (the OLAP
# dashboard "slice by any subset" query). One expand + one hash agg: at
# scale this beats k separate groupBys by reading the fact once. Nulls
# from the grouping sets are disambiguated with coalesce sentinels (same
# idiom as revenue_rollup).
@register(
    "revenue_cube",
    survey="A+(cube)",
    oracle=f"""
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR),
                'ALL') AS order_year,
       {_REV_SQL} AS revenue,
       count(*) AS line_ct
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, CAST(year(o_orderdate) AS INTEGER))
""",
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    fact = dim_cascade(
        fact,
        [
            (load_table(spark, sf_dir, "customer"), "o_custkey",
             "c_custkey", [("c_nationkey", "__nk")]),
            (load_table(spark, sf_dir, "nation"), "__nk", "n_nationkey",
             [("n_name", "n_name")]),
        ],
    ).withColumn("__yr", F.year("o_orderdate").cast("int"))
    return (
        fact.cube("n_name", "__yr")
        .agg(_revenue().alias("revenue"), F.count(F.lit(1)).alias("line_ct"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("__yr").cast("string"), F.lit("ALL")).alias(
                "order_year"
            ),
            "revenue",
            "line_ct",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8-style — market share: one supplier nation's fraction of a
# region's volume per year. Dim pyramid (part/supplier/customer/nation x2/
# region all broadcast), fact shuffles only for the orderkey join and the
# year aggregate; the share is a conditional-sum / sum ratio of exact
# decimal sums (deterministic division of bit-identical doubles).
@register(
    "tpch_q8_market_share",
    survey="J1,J4,J5,P5,A4",
    oracle=f"""
WITH v AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
           sn.n_name AS supp_nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                           THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM v GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_rk"),
    )
    cust = load_table(spark, sf_dir, "customer")
    one = F.lit(1).cast("decimal(18,2)")
    vol = dec("l_extendedprice") * (one - dec("l_discount"))
    v = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            broadcast(region), F.col("cn_rk") == region["r_regionkey"]
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    nat_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    ).cast("double")
    tot = F.sum("volume").cast("double")
    return v.groupBy("o_year").agg(
        F.round(nat_vol / tot, 6).alias("mkt_share"),
        tot.alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q15-style — top supplier by quarterly revenue. The revenue ranking
# is a two-level aggregate (per-supplier sum, then deterministic top-1 by
# rounded revenue + key); broadcast supplier enriches AFTER the aggregate
# (k rows), not before (the fact never carries supplier attributes).
@register(
    "tpch_q15_top_supplier",
    survey="J5,A4,D1(ext)",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey, {_REV_SQL} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
ORDER BY total_revenue DESC, s_suppkey
LIMIT 3
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(_revenue().alias("total_revenue"))
    return (
        rev.join(
            broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"]
        )
        .orderBy(F.col("total_revenue").desc(), F.col("s_suppkey").asc())
        .limit(3)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17-style — small-quantity-order revenue: lineitems of one brand
# below 20% of their part's average quantity. The per-part average is an
# aggregate used as a join-side threshold — both sides shuffle on partkey
# and Catalyst reuses the partitioning for the probe. The average is an
# exact decimal sum divided once (deterministic), so the 0.2x threshold
# compare cannot flip on summation order.
@register(
    "tpch_q17_small_qty_revenue",
    survey="J1,A4,P5",
    oracle=f"""
WITH pa AS (
    SELECT l_partkey AS pk,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly,
       count(*) AS line_ct
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa   ON l_partkey = pk
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
""",
)
def tpch_q17_small_qty_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(pa, li["l_partkey"] == pa["pk"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / 7.0, 4
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_ct"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19-style — OR-banded predicate revenue (brand x size x quantity
# bands; the testdata part table has no container column, so bands use
# brand/size/quantity only). The disjunction lives in ONE scan's pushed
# filter set — no union of three scans.
@register(
    "tpch_q19_banded_revenue",
    survey="P5,P7,A4",
    oracle=f"""
SELECT {_REV_SQL} AS revenue, count(*) AS line_ct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def tpch_q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    bands = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(bands)
        .agg(
            _revenue().alias("revenue"),
            F.count(F.lit(1)).alias("line_ct"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q2 shape: correlated SCALAR subquery (min price per part) — the
# decorrelation feature the catalog otherwise lacks. Expressed through
# the SQL API on purpose: Catalyst rewrites the correlated subquery into
# a left-semi-style aggregate join (no per-row re-execution); the
# DataFrame equivalent would hand-build that join and skip the feature.
# The testdata has no partsupp table, so "supply cost" is the exact
# decimal l_extendedprice minimum over the part's lineitems (no
# division, so the correlated equality compares exactly in both
# engines). DISTINCT collapses repeat sales at the min price.
@register(
    "tpch_q2_min_price_supplier",
    survey="J1,A4(subquery)",
    oracle="""
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
       CAST(l.l_extendedprice AS DOUBLE) AS min_price
FROM part p, lineitem l, supplier s, nation n
WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND p.p_size >= 30
  AND l.l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey)
""",
)
def tpch_q2_min_price_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = {
        n: f"parquet.`{sf_dir}/{n}.parquet`"
        for n in ("part", "lineitem", "supplier", "nation")
    }
    return spark.sql(f"""
        SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
               n.n_name, CAST(l.l_extendedprice AS DOUBLE) AS min_price
        FROM {t['part']} p, {t['lineitem']} l, {t['supplier']} s,
             {t['nation']} n
        WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
          AND s.s_nationkey = n.n_nationkey
          AND p.p_size >= 30
          AND l.l_extendedprice = (
              SELECT min(l2.l_extendedprice) FROM {t['lineitem']} l2
              WHERE l2.l_partkey = p.p_partkey)
    """)


# ---------------------------------------------------------------------------
# TPC-H q22 shape: uncorrelated scalar subquery (global average) feeding
# a filter PLUS a NOT EXISTS anti-join — the other classic subquery
# rewrite. Customers above the average positive balance with no URGENT
# orders (the unqualified form is empty on this dense testdata),
# summarized per nation. Balances average through DOUBLE in both
# engines (2-dp decimal inputs sit far from the threshold's last-ulp
# wobble); the balance sum itself stays decimal-exact until the final
# cast.
@register(
    "tpch_q22_dormant_customers",
    survey="J1(anti),A4(subquery)",
    oracle="""
SELECT c.c_nationkey AS nationkey, count(*) AS cust_ct,
       CAST(SUM(c.c_acctbal) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(CAST(c2.c_acctbal AS DOUBLE))
                     FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
""",
)
def tpch_q22_dormant_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = f"parquet.`{sf_dir}/customer.parquet`"
    orders = f"parquet.`{sf_dir}/orders.parquet`"
    return spark.sql(f"""
        SELECT c.c_nationkey AS nationkey, count(*) AS cust_ct,
               CAST(SUM(c.c_acctbal) AS DOUBLE) AS total_acctbal
        FROM {cust} c
        WHERE c.c_acctbal > (SELECT AVG(CAST(c2.c_acctbal AS DOUBLE))
                             FROM {cust} c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM {orders} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_nationkey
    """)


# ---------------------------------------------------------------------------
# TPC-H q13 shape: LEFT OUTER join with the filter in the JOIN condition
# (unmatched customers must survive as zero-order rows — moving the
# predicate to WHERE would silently drop them) feeding a two-level
# aggregation whose outer level is a histogram-of-counts. DataFrame API
# on purpose (q2/q22 cover the SQL-with-subqueries surface): the ON-side
# filter and the count(o_orderkey)-ignores-nulls semantics are the two
# classic left-join foot-guns this entry pins.
# Scale: one shuffle per aggregation level; the second input is already
# one row per customer, so the histogram shuffle is customer-count
# sized, and the final result is at most max-orders-per-customer rows.
@register(
    "tpch_q13_order_distribution",
    survey="J2,A3(histogram)",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust["c_custkey"] == orders["o_custkey"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# TPC-H q9 shape: profit by nation and year — a 4-dim snowflake join
# fanning out of lineitem with a per-row profit expression, grouped on
# derived columns from two different branches of the join tree (nation
# from the supplier branch, year from the orders branch). The testdata
# has no partsupp, so cost is p_retailprice * quantity; profit can go
# negative, which exercises signed decimal sums.
# Scale: part/supplier/nation broadcast; lineitem-orders shuffles once
# on orderkey; the group-by keys are tiny (25 nations x 7 years), so the
# final exchange is map-side-combined to a few hundred rows.
@register(
    "tpch_q9_product_profit",
    survey="J1,J5,A4",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    profit = F.sum(
        dec("l_extendedprice") * (one - dec("l_discount"))
        - dec("p_retailprice") * dec("l_quantity")
    ).cast("double")
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(profit.alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H q11 shape: grouped value with a HAVING threshold drawn from an
# uncorrelated scalar subquery over the SAME filtered join — the
# "fraction of the global total" pattern. SQL API on purpose: Catalyst
# plans the scalar subquery once (a one-row broadcast into the filter),
# not per group. No partsupp, so "inventory value" is quantity-weighted
# extended price from suppliers in the low-key nations.
# Scale: the subquery is a second scan+agg producing ONE row; both
# aggregations are map-side combined on l_partkey; the threshold
# comparison is a scalar filter after the group-by, no extra shuffle.
@register(
    "tpch_q11_important_stock",
    survey="J1,A4(subquery)",
    oracle="""
SELECT l_partkey AS partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
WHERE s_nationkey < 13
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
       0.001 * (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_quantity AS DECIMAL(18,2)))
                            AS DOUBLE)
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                WHERE s_nationkey < 13)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = f"parquet.`{sf_dir}/lineitem.parquet`"
    supp = f"parquet.`{sf_dir}/supplier.parquet`"
    value = (
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
    )
    return spark.sql(f"""
        SELECT l_partkey AS partkey, {value} AS value
        FROM {li} JOIN {supp} ON s_suppkey = l_suppkey
        WHERE s_nationkey < 13
        GROUP BY l_partkey
        HAVING {value} >
               0.001 * (SELECT {value}
                        FROM {li} JOIN {supp} ON s_suppkey = l_suppkey
                        WHERE s_nationkey < 13)
    """)


# ---------------------------------------------------------------------------
# TPC-H q12 shape: join + conditional two-way count split (the
# priority-class CASE pivot). No l_shipmode/receiptdate in the testdata,
# so the grouping key is l_linestatus and "late" is shipped >30 days
# after the order date. Counts go through CAST(SUM(CASE) AS BIGINT) so
# the oracle side never widens to HUGEINT.
# Scale: one shuffle (orders-lineitem equi-join, AQE may broadcast at
# low SF), then a 2-3 row hash agg; the CASE folds into codegen.
@register(
    "tpch_q12_priority_split",
    survey="J1,P5,A4",
    oracle="""
SELECT l_linestatus AS linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
""",
)
def tpch_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q16 shape: DISTINCT-count of suppliers per part attribute triple
# with a NOT IN exclusion subquery (the anti-join rewrite) and a
# multi-predicate dimension filter. lineitem stands in for partsupp
# (its (l_partkey, l_suppkey) pairs are the supplies-this-part
# relation); the excluded suppliers are the low-balance ones.
# Scale: part is broadcast into lineitem; the NOT IN set is k rows and
# broadcast as a null-aware anti join (s_suppkey is non-null, so the
# null-semantics trap stays inert); count(DISTINCT) shuffles once on
# the group keys with a per-partition de-dup first.
@register(
    "tpch_q16_supplier_cnt",
    survey="J1(anti),A7",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(broadcast(excluded), "l_suppkey", "left_anti")
        .join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H q20 shape: a semi-join (IN) whose subquery filters an aggregate
# built per (supplier, part) pair against a pair-correlated fraction —
# "suppliers who shipped more than half of a part's lifetime volume in
# 1997". No partsupp, so the pair relation is lineitem's grouped
# (l_suppkey, l_partkey) with decimal-exact quantity sums; the part
# filter is the classic name-prefix LIKE. SQL API on purpose: the IN
# subquery decorrelates to a left-semi join, and the CTE's two
# conditional sums come from ONE scan (vs the reference query's two
# correlated scans).
# Scale: pair aggregation shuffles lineitem once on the composite key
# with map-side combine; part is broadcast into the k-row pair side;
# the final semi join is supplier-count sized.
@register(
    "tpch_q20_excess_shippers",
    survey="J1(semi),A4(subquery)",
    oracle="""
WITH pair AS (
    SELECT l_suppkey, l_partkey,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               AS q97,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qall
    FROM lineitem
    GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
    SELECT pair.l_suppkey
    FROM pair JOIN part ON p_partkey = pair.l_partkey
    WHERE p_name LIKE 'cold%' AND pair.q97 > 0.5 * pair.qall)
""",
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {
        n: f"parquet.`{sf_dir}/{n}.parquet`"
        for n in ("lineitem", "part", "supplier", "nation")
    }
    return spark.sql(f"""
        WITH pair AS (
            SELECT l_suppkey, l_partkey,
                   CAST(SUM(CASE WHEN l_shipdate >=
                                      TIMESTAMP '1997-01-01 00:00:00'
                                  AND l_shipdate <
                                      TIMESTAMP '1998-01-01 00:00:00'
                                 THEN CAST(l_quantity AS DECIMAL(18,2))
                                 ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DOUBLE) AS q97,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DOUBLE) AS qall
            FROM {t['lineitem']}
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey, s_name, n_name
        FROM {t['supplier']} JOIN {t['nation']}
          ON n_nationkey = s_nationkey
        WHERE s_suppkey IN (
            SELECT pair.l_suppkey
            FROM pair JOIN {t['part']} ON p_partkey = pair.l_partkey
            WHERE p_name LIKE 'cold%' AND pair.q97 > 0.5 * pair.qall)
    """)


# ---------------------------------------------------------------------------
# TPC-H q21 shape: EXISTS plus NOT EXISTS over the SAME fact table,
# both correlated to the outer row's order and one through a non-equi
# predicate on an OUTER column (o_orderdate) — the hardest decorrelation
# in the suite. "Suppliers who were the sole late shipper on a
# multi-supplier order": late = shipped >60 days after the order date
# (no receipt/commit dates in the testdata).
# Scale: Catalyst turns the EXISTS into a left-semi and the NOT EXISTS
# into a left-anti join, each shuffling lineitem on l_orderkey — three
# scans of lineitem but no per-row re-execution; the nation filter
# prunes the outer side before either join.
@register(
    "tpch_q21_waiting_suppliers",
    survey="J1(semi),J1(anti),A4(subquery)",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_nationkey < 13
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {
        n: f"parquet.`{sf_dir}/{n}.parquet`"
        for n in ("lineitem", "orders", "supplier", "nation")
    }
    return spark.sql(f"""
        SELECT s_name, count(*) AS numwait
        FROM {t['supplier']}
        JOIN {t['lineitem']} l1 ON s_suppkey = l1.l_suppkey
        JOIN {t['orders']} o ON o.o_orderkey = l1.l_orderkey
        JOIN {t['nation']} ON n_nationkey = s_nationkey
        WHERE n_nationkey < 13
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM {t['lineitem']} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM {t['lineitem']} l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
    """)
