"""Traffic/user-behavior queries over the ``events`` table.

These re-express the reference's log-side DWD jobs and DWS windowed
aggregations (SURVEY section 2.3/2.5-2.8) on the driver's event stream:
``events(event_id, ts, user_id, event_type, value, props)`` stands in for
``topic_log`` (user_id ~ mid/uid, event_type ~ page_id, props ~ nested
payload). The gmall-schema pipelines themselves live in plans.gmall; here
the same operators run on driver data so they are oracle-checkable.

The reference's 10 s tumbling windows are widened to 10 minutes to match
this dataset's event density; the operator (epoch-aligned tumble + agg) is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import latest_row_per_key
from ..operators.jumpout import jump_out_batch
from ..operators.routing import route_by_config
from ..operators.visitor import first_per_period, first_visit_repair, gap_flag
from ..operators.windows import tumble_agg
from ..sources.testdata import load_table
from ._parity import dsum, DSUM_SQL
from .catalog import register

_BUCKET = "time_bucket(INTERVAL '10 minutes', ts)"
SESSION_GAP_S = 1800  # sessionization gap for the jump-out analog
_GAP_US = SESSION_GAP_S * 1_000_000


# ---------------------------------------------------------------------------
# A1/W1 — keyed tumbling-window multi-measure aggregation
# (dws_traffic_vc_ch_ar_is_new_page_view_window,
#  reference app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:225-280)
@register(
    "traffic_event_type_window",
    survey="A1,W1,K4",
    headline=True,
    oracle=f"""
SELECT {_BUCKET} AS stt,
       {_BUCKET} + INTERVAL '10 minutes' AS edt,
       event_type,
       count(*) AS pv_ct,
       count(DISTINCT user_id) AS uv_ct,
       {DSUM_SQL('value')} AS value_sum
FROM events
GROUP BY 1, 2, 3
""",
)
def traffic_event_type_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        {
            "pv_ct": F.count(F.lit(1)),
            "uv_ct": F.countDistinct("user_id"),
            "value_sum": dsum("value"),
        },
    )


# ---------------------------------------------------------------------------
# A2 — global (non-keyed) window with conditional distinct counts
# (dws_traffic_page_view_window, DwsTrafficPageViewWindow.java:115-207)
@register(
    "traffic_home_detail_uv_window",
    survey="A2,W1",
    oracle=f"""
SELECT {_BUCKET} AS stt,
       {_BUCKET} + INTERVAL '10 minutes' AS edt,
       count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS home_uv_ct,
       count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS good_detail_uv_ct
FROM events
GROUP BY 1, 2
""",
)
def traffic_home_detail_uv_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "10 minutes",
        [],
        {
            "home_uv_ct": F.countDistinct(
                F.when(F.col("event_type") == "view", F.col("user_id"))
            ),
            "good_detail_uv_ct": F.countDistinct(
                F.when(F.col("event_type") == "click", F.col("user_id"))
            ),
        },
    )


# ---------------------------------------------------------------------------
# A3 — filtered windowed count (dws_user_user_register_window,
# DwsUserUserRegisterWindow.java:89-138)
@register(
    "user_register_window",
    survey="A3,W1,P7",
    oracle=f"""
SELECT {_BUCKET} AS stt,
       {_BUCKET} + INTERVAL '10 minutes' AS edt,
       count(*) AS register_ct
FROM events
WHERE event_type = 'signup'
GROUP BY 1, 2
""",
)
def user_register_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return tumble_agg(
        ev, "ts", "10 minutes", [], {"register_ct": F.count(F.lit(1))}
    )


# ---------------------------------------------------------------------------
# A6 — first-row-per-(key, day): the unique-visitor-detail operator
# (dwd_traffic_unique_visitor_detail, DwdTrafficUniqueVisitorDetail.java:86-116)
@register(
    "unique_visitor_detail",
    survey="A6,D4,W8",
    oracle="""
SELECT event_id, user_id, ts, CAST(ts AS DATE) AS visit_date
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
) = 1
""",
)
def unique_visitor_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uv = first_per_period(ev, "user_id", "ts", tiebreak=("event_id",))
    return uv.select(
        "event_id", "user_id", "ts", F.to_date("ts").alias("visit_date")
    )


# ---------------------------------------------------------------------------
# D4 — first-visit (is_new) repair (BaseLogApp.java:109-149)
@register(
    "visitor_repair",
    survey="D4",
    oracle="""
SELECT event_id, user_id,
       CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE))
                 OVER (PARTITION BY user_id)
            THEN 1 ELSE 0 END AS is_new
FROM events
""",
)
def visitor_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return first_visit_repair(ev, "user_id", "ts").select(
        "event_id", "user_id", "is_new"
    )


# ---------------------------------------------------------------------------
# A6 gap variant — unique users + 8-day back-flow per day
# (dws_user_user_login_window, DwsUserUserLoginWindow.java:126-217)
@register(
    "user_login_window",
    survey="A6,A2,W1",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events
), flags AS (
    SELECT dt,
           CASE WHEN lag(dt) OVER w IS NOT NULL
                 AND date_diff('day', lag(dt) OVER w, dt) >= 8
                THEN 1 ELSE 0 END AS is_back
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY dt)
)
SELECT dt AS cur_date,
       count(*) AS uu_ct,
       CAST(sum(is_back) AS BIGINT) AS back_ct
FROM flags GROUP BY dt
""",
)
def user_login_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.to_date("ts").alias("dt")
    ).distinct()
    flagged = gap_flag(daily, "user_id", "dt", min_gap_days=8)
    return flagged.groupBy(F.col("dt").alias("cur_date")).agg(
        F.count(F.lit(1)).alias("uu_ct"),
        F.sum("is_back").alias("back_ct"),
    )


# ---------------------------------------------------------------------------
# W5 — jump-out (bounce) detection, the CEP analog
# (dwd_traffic_user_jump_detail, DwdTrafficUserJumpDetail.java:104-147).
# Session-start = first event or >30 min gap; a start bounces when no
# non-start event follows within the gap window.
@register(
    "user_jump_detail",
    survey="W5,J7,W2",
    oracle=f"""
WITH t AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('microsecond', lag(ts) OVER w, ts) > {_GAP_US}
                THEN TRUE ELSE FALSE END AS is_start,
           lead(ts) OVER w AS nxt_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts
FROM t
WHERE is_start
  AND (nxt_ts IS NULL
       OR date_diff('microsecond', ts, nxt_ts) > {_GAP_US})
""",
)
def user_jump_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w)
    with_start = ev.withColumn(
        "__is_start",
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) > _GAP_US),
    )
    jumps = jump_out_batch(
        with_start,
        key="user_id",
        ts_col="ts",
        is_session_start=F.col("__is_start"),
        timeout_seconds=SESSION_GAP_S,
        tiebreak="event_id",
    )
    return jumps.select("event_id", "user_id", "ts")


# ---------------------------------------------------------------------------
# D1 — latest-row-per-key dedup (DwsTradeOrderWindow.java:122-164 idiom)
@register(
    "dedup_latest_event",
    survey="D1,D2,D3",
    headline=True,
    oracle="""
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
) = 1
""",
)
def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = latest_row_per_key(
        ev, keys=("user_id", "event_type"), order_by=("ts", "event_id")
    )
    return latest.select("user_id", "event_type", "event_id", "ts", "value")


# ---------------------------------------------------------------------------
# P3/P6 — CDC-style JSON field projection + predicate on extracted value
# (DwdTradeOrderPreProcess.java:68-86; DwdToolCouponOrder.java:101-111)
@register(
    "cdc_json_project",
    survey="P3,P6,P1",
    oracle="""
SELECT event_id, user_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       value
FROM events
WHERE event_type = 'purchase'
  AND CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
""",
)
def cdc_json_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("k", k)
        .filter(F.col("k") >= 50)
        .select("event_id", "user_id", "k", "value")
    )


# ---------------------------------------------------------------------------
# J6/P9 — broadcast config-table routing (DimSinkApp.java:106-114,
# MyBroadcastFunction.java:43-97)
_ROUTE_CONFIG = [
    ("click", "dwd_traffic_click"),
    ("view", "dwd_traffic_page"),
    ("purchase", "dwd_trade_order"),
    ("signup", "dwd_user_register"),
]
_ROUTE_VALUES = ", ".join(f"('{s}', '{t}')" for s, t in _ROUTE_CONFIG)


@register(
    "config_routed_counts",
    survey="J6,P9,K3",
    oracle=f"""
SELECT cfg.sink_table,
       count(*) AS event_ct,
       {DSUM_SQL('value')} AS value_sum
FROM events e
JOIN (VALUES {_ROUTE_VALUES}) AS cfg(source_table, sink_table)
  ON e.event_type = cfg.source_table
GROUP BY cfg.sink_table
""",
)
def config_routed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from ..indexutil import local_frame

    cfg = local_frame(
        spark, _ROUTE_CONFIG, "source_table string, sink_table string"
    )
    routed = route_by_config(ev, cfg, route_key="event_type")
    return routed.groupBy("sink_table").agg(
        F.count(F.lit(1)).alias("event_ct"),
        dsum("value").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# U1/U2/P10 — split into typed branches with constant measures, union back,
# window-sum (the TrafficPageViewBean union pattern,
# DwsTrafficVcChArIsNewPageViewWindow.java:84-206)
@register(
    "split_union_daily",
    survey="U1,U2,P10,K5",
    oracle="""
WITH tagged AS (
    SELECT CAST(ts AS DATE) AS dt, 1 AS pv, 0 AS clk, 0 AS err
    FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT CAST(ts AS DATE) AS dt, 0 AS pv, 1 AS clk, 0 AS err
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT CAST(ts AS DATE) AS dt, 0 AS pv, 0 AS clk, 1 AS err
    FROM events WHERE event_type = 'error'
)
SELECT dt,
       CAST(sum(pv) AS BIGINT) AS pv_ct,
       CAST(sum(clk) AS BIGINT) AS click_ct,
       CAST(sum(err) AS BIGINT) AS error_ct
FROM tagged GROUP BY dt
""",
)
def split_union_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def branch(etype: str, pv: int, clk: int, err: int) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select(
            F.to_date("ts").alias("dt"),
            F.lit(pv).alias("pv"),
            F.lit(clk).alias("clk"),
            F.lit(err).alias("err"),
        )

    tagged = (
        branch("view", 1, 0, 0)
        .unionByName(branch("click", 0, 1, 0))
        .unionByName(branch("error", 0, 0, 1))
    )
    return tagged.groupBy("dt").agg(
        F.sum("pv").alias("pv_ct"),
        F.sum("clk").alias("click_ct"),
        F.sum("err").alias("error_ct"),
    )


# ---------------------------------------------------------------------------
# Beyond the reference (SURVEY 2.6 notes it has no session/sliding
# windows): both are native Spark windows and core traffic-warehouse
# operators, so the engine ships them oracle-checked.
#
# Session windows: merge a user's events closer than the gap; Spark's
# session bounds are [first_event, last_event + gap). Oracle: classic
# gaps-and-islands (new-session flag -> running island id -> group).
@register(
    "session_window_stats",
    survey="W1+(session),A1",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('microsecond', lag(ts) OVER w, ts)
                    > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), islands AS (
    SELECT user_id, ts,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '{SESSION_GAP_S} seconds' AS session_end,
       count(*) AS event_ct
FROM islands
GROUP BY user_id, sess_id
""",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("event_ct"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "event_ct",
        )
    )


# Sliding (hopping) windows: 20-minute window advancing every 10 minutes —
# each event lands in 2 overlapping windows. Oracle: explode the hop
# offsets per event.
@register(
    "sliding_window_counts",
    survey="W1+(sliding),A1",
    oracle=f"""
WITH hops AS (
    SELECT event_type, value,
           time_bucket(INTERVAL '10 minutes', ts)
               - (k * INTERVAL '10 minutes') AS wstart,
           ts
    FROM events, unnest([0, 1]) AS t(k)
)
SELECT wstart AS stt,
       wstart + INTERVAL '20 minutes' AS edt,
       event_type,
       count(*) AS pv_ct,
       {DSUM_SQL('value')} AS value_sum
FROM hops
WHERE ts >= wstart AND ts < wstart + INTERVAL '20 minutes'
GROUP BY 1, 2, 3
""",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "20 minutes", "10 minutes")
    return (
        ev.groupBy(win.alias("__w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            dsum("value").alias("value_sum"),
        )
        .select(
            F.col("__w.start").alias("stt"),
            F.col("__w.end").alias("edt"),
            "event_type",
            "pv_ct",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# P5 — conditional expression (the cart-add sku_num delta idiom,
# DwdTradeCartAdd.java:84-93): signed measure by change type, summed per
# day exactly via decimal.
@register(
    "conditional_net_value",
    survey="P5,A4",
    oracle="""
SELECT CAST(ts AS DATE) AS dt,
       CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                          WHEN event_type = 'error' THEN -value
                          ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
           AS net_value
FROM events
GROUP BY 1
""",
)
def conditional_net_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signed = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    return ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.sum(signed.cast("decimal(18,2)")).cast("double").alias("net_value")
    )


# ---------------------------------------------------------------------------
# 100 TB variant of the distinct-count window: HLL sketch instead of exact
# distinct (the approx swap SURVEY section 4 calls out). Deterministic for
# fixed input but engine-specific -> rows-only check (DuckDB's approx
# sketch differs by construction).
@register("traffic_uv_window_approx", survey="A1,A7(scale)", oracle=None)
def traffic_uv_window_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        {
            "pv_ct": F.count(F.lit(1)),
            "uv_ct_approx": F.approx_count_distinct("user_id", rsd=0.02),
        },
    )


# ---------------------------------------------------------------------------
# The same tumbling aggregation executed by Structured Streaming end to end
# (file source over the events parquet -> watermark -> window agg -> memory
# sink, availableNow). Oracle-checked: streaming output must equal the
# batch/DuckDB result. Distinct counts are not legal in streaming aggs, so
# the measure set is additive-only.
@register(
    "streaming_event_type_window",
    survey="W1,W3,S1,K1(streaming)",
    headline=True,
    oracle=f"""
SELECT {_BUCKET} AS stt,
       {_BUCKET} + INTERVAL '10 minutes' AS edt,
       event_type,
       count(*) AS pv_ct,
       {DSUM_SQL('value')} AS value_sum
FROM events
GROUP BY 1, 2, 3
""",
)
def streaming_event_type_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import run_to_memory

    from ..indexutil import footer_spark_schema

    # the streaming file source wants a directory; glob-filter to the one
    # table file inside the sf dir. Schema resolved DRIVER-SIDE from the
    # footer (footer_spark_schema mirrors inference incl. nanosAsLong)
    # — no schema-inference Spark job per invocation.
    stream = (
        spark.readStream.schema(
            footer_spark_schema(f"{sf_dir}/events.parquet")
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (with local tz), so stream on the LTZ
    # instant; the absolute epoch value is tz-independent either way
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = tumble_agg(
        stream,
        "ts",
        "10 minutes",
        ["event_type"],
        {
            "pv_ct": F.count(F.lit(1)),
            "value_sum": dsum("value"),
        },
        watermark="3 seconds",
    )
    result = run_to_memory(agg, mode="complete")
    # LTZ window bounds -> NTZ via epoch micros (independent of whatever
    # session timezone the driver runs with), matching the batch/oracle form
    to_ntz = lambda c: F.expr(  # noqa: E731
        f"timestampadd(MICROSECOND, unix_micros({c}),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias(c)
    return result.select(
        to_ntz("stt"), to_ntz("edt"), "event_type", "pv_ct", "value_sum"
    )


# ---------------------------------------------------------------------------
# Skew-salted aggregation in the driver-checked catalog: the two-stage
# (key, salt) -> key plan must produce exactly the plain GROUP BY result.
# events.event_type has few distinct values over many rows — the shape
# where one hot key funnels a single reducer at 100 TB and salting spreads
# it over ~32 partials (operators/skew.py). Algebraic measures only.
@register(
    "salted_event_type_stats",
    survey="A4(skew)",
    oracle=f"""
SELECT event_type,
       count(*) AS ev_ct,
       {DSUM_SQL('value')} AS value_sum,
       min(user_id) AS min_user,
       max(user_id) AS max_user
FROM events
GROUP BY event_type
""",
)
def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "ev_ct": ("count", "*"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
    )
    # decimal value_sum merges algebraically too, but salted_agg's fn set
    # is (sum,count,min,max) over raw columns; do the exact-decimal sum as
    # its own salted pass and join on the (tiny) key set
    vs = salted_agg(
        events.withColumn("__v", F.col("value").cast("decimal(18,2)")),
        ["event_type"],
        {"value_sum_dec": ("sum", "__v")},
    ).select(
        "event_type", F.col("value_sum_dec").cast("double").alias("value_sum")
    )
    return out.join(vs, "event_type").select(
        "event_type", "ev_ct", "value_sum", "min_user", "max_user"
    )


# ---------------------------------------------------------------------------
# Top-N per group — the rank-window OLAP shape (leaderboards, "top sources
# per channel"). row_number + rn<=N compiles to WindowGroupLimit partial/
# final (top-N held map-side BEFORE the exchange — same pushdown the D1
# dedup gets), so the shuffle moves at most N rows per group, not the
# full per-user count table. Ties break on user_id for determinism.
TOP_N_USERS = 3


@register(
    "top_users_per_event_type",
    survey="A4,D1(ext)",
    oracle=f"""
WITH c AS (
    SELECT event_type, user_id,
           count(*) AS ev_ct,
           {DSUM_SQL('value')} AS value_sum
    FROM events
    GROUP BY event_type, user_id
), r AS (
    SELECT c.*, row_number() OVER (
               PARTITION BY event_type
               ORDER BY ev_ct DESC, user_id) AS rn
    FROM c
)
SELECT event_type, user_id, ev_ct, value_sum,
       CAST(rn AS INTEGER) AS rank
FROM r WHERE rn <= {TOP_N_USERS}
""",
)
def top_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("ev_ct"),
        dsum("value").alias("value_sum"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ev_ct").desc(), F.col("user_id").asc()
    )
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N_USERS)
        .select(
            "event_type", "user_id", "ev_ct", "value_sum",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join — point-in-time enrichment ("the last purchase strictly
# before each view"). The operator (operators/joins.py::asof_join) is the
# union + running-last window form: one shuffle on the key, codegen
# window, no candidate-pair materialization — the 100 TB-safe as-of
# strategy. The oracle uses DuckDB's native ASOF LEFT JOIN; identical
# semantics (latest right row with right_ts < left_ts per key).
@register(
    "asof_last_purchase_before_view",
    survey="J+(asof),J1(ext)",
    oracle="""
WITH v AS (
    SELECT user_id, event_id AS view_id, ts
    FROM events WHERE event_type = 'view'
), p AS (
    SELECT user_id, event_id AS purchase_id, ts AS pts, value AS pval
    FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.ts, v.view_id,
       p.purchase_id AS asof_purchase_id,
       p.pval AS asof_purchase_value
FROM v ASOF LEFT JOIN p
  ON v.user_id = p.user_id AND p.pts < v.ts
""",
)
def asof_last_purchase_before_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="pts",
        right_cols=["purchase_id", "purchase_value"],
        strict=True,
        tiebreak="purchase_id",
    )


# ---------------------------------------------------------------------------
# Interval join — Flink's intervalJoin (DwdTradeOrderPreProcess-family
# stream pairing): purchases within 30 minutes AFTER a view by the same
# user. Hash equi-join on the key with the time range as a post-join
# filter; streaming state is bounded by watermark + interval width. The
# gap surfaces as whole microseconds (exact in both engines).
@register(
    "interval_join_purchase_after_view",
    survey="J+(interval),J1(ext)",
    oracle="""
WITH v AS (
    SELECT user_id, event_id AS view_id, ts FROM events
    WHERE event_type = 'view'
), p AS (
    SELECT user_id, event_id AS purchase_id, ts AS pts FROM events
    WHERE event_type = 'purchase'
)
SELECT v.view_id, p.purchase_id, v.user_id,
       date_diff('microsecond', v.ts, p.pts) AS gap_us
FROM v JOIN p
  ON v.user_id = p.user_id
 AND p.pts > v.ts
 AND p.pts <= v.ts + INTERVAL 30 MINUTE
""",
)
def interval_join_purchase_after_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    joined = views.join(
        purchases,
        (views["user_id"] == purchases["p_user_id"])
        & (purchases["pts"] > views["ts"])
        & (
            purchases["pts"]
            <= views["ts"] + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    return joined.select(
        "view_id",
        "purchase_id",
        "user_id",
        F.expr("timestampdiff(MICROSECOND, ts, pts)").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Range join — non-equi banding against a tiny tier table ("which price
# band does each event fall in"). The tier side is literal/broadcast, so
# the non-equi predicate compiles to BroadcastNestedLoopJoin over k tier
# rows — per-row O(k) map-side work, no shuffle for the join itself; the
# only exchange is the final aggregate. (For range joins against a LARGE
# right side, bucket both sides by floor(value/width) first and equi-join
# the bucket id — the interval_join / LSH pattern.)
VALUE_TIERS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 100.0),
    ("high", 100.0, 1000.0),
]


@register(
    "value_tier_counts",
    survey="J+(range),J6(ext),A4",
    oracle=f"""
WITH tiers(tier, lo, hi) AS (
    VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in VALUE_TIERS)}
)
SELECT tier, count(*) AS ev_ct,
       {DSUM_SQL('value')} AS value_sum
FROM events JOIN tiers
  ON value >= lo AND value < hi
GROUP BY tier
""",
)
def value_tier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")
    from ..indexutil import local_frame

    tiers = local_frame(spark, VALUE_TIERS, "tier string, lo double, hi double")
    return (
        ev.join(
            broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("ev_ct"),
            dsum("value").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# The stateful-streaming operator class under the ORACLE gate (not just
# rows-only): latest-row-per-user over the events table executed through
# applyInPandasWithState (streaming_latest_per_key — per-key state,
# event-time quiesce timers), hash-matching the same window-function
# dedup in DuckDB. Bounded-run mechanics: the builder stages a work dir
# (events symlinked + one far-future sentinel row) so the final
# watermark passes every real key's quiesce timer; the sentinel key
# itself stays in state and is filtered defensively. The emitted
# timestamp is normalized to epoch MICROseconds on both engines, so the
# entry is insensitive to whether the session reads the nanos parquet
# column as long (nanosAsLong) or TIMESTAMP_NTZ.
@register(
    "streaming_dedup_latest_stateful",
    survey="W7,D1,F3(streaming)",
    oracle="""
SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events)
WHERE rn = 1
""",
)
def streaming_dedup_latest_stateful(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.jobs import run_to_memory
    from ..streaming.stateful import streaming_latest_per_key

    import pyarrow as pa
    import pyarrow.parquet as papq

    from ..indexutil import footer_spark_schema

    work = tempfile.mkdtemp(prefix="gmall-stateful-dedup-")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        src_file = os.path.join(sf_dir, "events.parquet")
        os.symlink(src_file, os.path.join(src, "events.parquet"))
        # the one-row sentinel file and the stream schema are both
        # derived DRIVER-SIDE (pyarrow footer read + local write) —
        # the old staging paid a Spark schema-inference job plus a
        # Spark write job per invocation for one synthetic row. The
        # sentinel values are identical: 2100-01-01 00:00:00 in the
        # source's own ts representation (epoch nanos when the engine
        # reads TIMESTAMP(NANOS) as long, wall-time NTZ otherwise).
        asch = papq.read_schema(src_file)
        sent_vals = {
            "event_id": -1,
            "user_id": -1,
            "event_type": "sentinel",
            "value": 0.0,
            "props": "",
        }
        unit_mult = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
        cols = []
        for f in asch:
            if f.name == "ts":
                if pa.types.is_timestamp(f.type):
                    v = pa.array(
                        [4102444800 * unit_mult[f.type.unit]], pa.int64()
                    ).cast(f.type)
                else:  # physical int64 nanos
                    v = pa.array([4102444800 * 10**9], f.type)
            elif f.name in sent_vals:
                v = pa.array([sent_vals[f.name]], f.type)
            else:
                v = pa.nulls(1, f.type)
            cols.append(v)
        papq.write_table(
            pa.Table.from_arrays(cols, schema=asch),
            os.path.join(src, "sentinel.parquet"),
        )
        sch = footer_spark_schema(src_file)
        ts_is_long = dict((f.name, f.dataType.simpleString())
                          for f in sch.fields)["ts"] == "bigint"
        if ts_is_long:
            ev = F.timestamp_micros(F.expr("ts div 1000"))
            ts_us = F.expr("ts div 1000")
        else:
            ev = F.col("ts").cast("timestamp")  # watermark wants LTZ
            ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        stream = (
            spark.readStream.schema(sch)
            .parquet(src)
            .select(
                "event_id",
                "user_id",
                ts_us.alias("ts_us"),
                ev.alias("event_time"),
            )
            .withWatermark("event_time", "3 seconds")
        )
        ded = streaming_latest_per_key(
            stream,
            key="user_id",
            ts_col="event_time",
            order_by=["ts_us", "event_id"],
            out_schema="user_id long, event_id long, ts_us long",
            out_cols=["user_id", "event_id", "ts_us"],
        )
        result = run_to_memory(ded, mode="append")
        return result.filter(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(work, ignore_errors=True)
