"""Always-on streaming runners for the traffic/user (log-side) DWS jobs.

The reference runs these as four independent Flink jobs reading Kafka
topics (DwsTrafficSourceKeywordPageViewWindow.java,
DwsTrafficVcChArIsNewPageViewWindow.java:225-280,
DwsTrafficPageViewWindow.java, DwsUserUserLoginWindow.java). Here each
chain stage is a checkpointed Structured Streaming query chained over
parquet directories (the Kafka-topic analog, QUIRKS.md):

- stage 1 (DWD detail, append): the stateful per-key operators — UV
  first-per-day, jump-out CEP, per-page UV, login back-flow gap — run as
  ``applyInPandasWithState`` queries writing detail tables. These are the
  reference's DwdTrafficUniqueVisitorDetail / DwdTrafficUserJumpDetail
  jobs plus the keyed state the two DWS jobs hold internally.
- stage 2 (DWS windows): pure windowed aggregations over the
  detail/page streams, in one of two modes:
  * ``complete`` (default) -> foreachBatch overwrite: the aggregation
    state re-emits the full (small) summary per trigger — the
    ClickHouse-replace analog. State grows with the number of distinct
    windows, fine while summaries stay small.
  * ``append`` -> watermarked parquet append: each window emits exactly
    once when the watermark passes its end, then its state is EVICTED —
    bounded state, the declared 100 TB mode. The cost is emission
    latency: a window's row appears only after later events advance the
    watermark past window end + delay, so the stream's tail windows stay
    pending until more data arrives. The aggregation plan is identical
    in both modes; only sink/state lifecycle differ.

Two stages cannot fuse into one query: applyInPandasWithState followed by
a windowed aggregation is outside Spark's supported multi-stateful-operator
set, and the intermediate detail tables are real reference DWD outputs
anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from ..operators.windows import tumble_agg
from .sources import file_stream  # noqa: F401  (re-export convenience)
from .stateful import (
    streaming_first_per_day,
    streaming_first_per_day_gap,
    streaming_jump_out,
)

WINDOW = "10 seconds"

_DIM_COLS = ["vc", "ch", "ar", "is_new"]

DETAIL_TABLES = (
    "dwd_traffic_uv_detail",
    "dwd_traffic_user_jump_detail",
    "dwd_traffic_pv_first_detail",
    "dwd_user_login_detail",
)
DWS_TABLES = (
    "dws_traffic_source_keyword_page_view_window",
    "dws_traffic_vc_ch_ar_is_new_page_view_window",
    "dws_traffic_page_view_window",
    "dws_user_user_login_window",
)


def page_stream(spark: SparkSession, dwd_dir: str) -> DataFrame:
    """File-stream over the streamed dwd_traffic_page table (schema from a
    batch peek — the dir must exist, i.e. the log-side fan-out ran)."""
    path = os.path.join(dwd_dir, "dwd_traffic_page")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _flat_dims(df: DataFrame) -> list:
    return [F.col(f"common.{c}").alias(c) for c in _DIM_COLS]


def _overwrite_sink(target: str):
    def write(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(target)

    return write


def _start_complete(df: DataFrame, target: str, ckpt: str):
    return (
        df.writeStream.outputMode("complete")
        .foreachBatch(_overwrite_sink(target))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _start_append_parquet(df: DataFrame, target: str, ckpt: str):
    return (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


# default watermark delay for append-mode window stages (matches the
# detail stage's delay — the reference's 3 s bounded out-of-orderness).
# Runners accept a ``watermark`` override for sources with a different
# lateness tolerance (emission latency vs lateness trade-off).
_WINDOW_WM = "3 seconds"


def _window_mode(mode: str, watermark: str | None = None) -> str | None:
    """Validate the stage-2 mode; returns the watermark to pass to
    tumble_agg (None keeps complete-mode unbounded accumulation)."""
    if mode not in ("complete", "append"):
        raise ValueError(f"mode must be 'complete' or 'append': {mode!r}")
    return (watermark or _WINDOW_WM) if mode == "append" else None


def _start_window(df: DataFrame, target: str, ckpt: str, mode: str):
    if mode == "append":
        return _start_append_parquet(df, target, ckpt)
    return _start_complete(df, target, ckpt)


def _recover_compaction_targets(targets) -> None:
    """Heal crashed compactions BEFORE any stage query starts: a sink
    resuming on a mid-flip log would append (and eventually fold a new
    .compact) on top of corrupted state, turning a recoverable crash
    into permanent row loss. Cheap no-op when no backup marker exists."""
    from .compaction import recover_sink_log_dir

    for t in targets:
        recover_sink_log_dir(t)  # no-op without a _spark_metadata dir


def _auto_compact(spark, targets, max_files: int | None) -> None:
    """Opt-in post-run small-file compaction, hooked by the chain
    runners via their ``auto_compact`` parameter (the small-file-count
    threshold; None = off). Runs in the trigger gap — after every query
    of the availableNow run has terminated — which is exactly the
    stopped-writer window streaming/compaction.py's contract requires.

    ONLY terminal topic dirs (the paths a runner returns) are eligible.
    Intermediate detail dirs are consumed by the next stage as FILE
    STREAMS whose checkpoints remember the original file names; a
    chained FileStreamSource treats compacted files as brand-new input
    and re-processes every row (pinned by
    tests/test_compaction.py::test_compacting_chained_detail_dir_duplicates),
    so compacting them mid-chain corrupts downstream results."""
    if max_files is None:
        return
    from .compaction import compact_dir

    for t in targets:
        if os.path.isdir(t):
            compact_dir(spark, t, max_files=max_files)


def run_detail_jobs(
    spark: SparkSession, dwd_dir: str, ckpt_dir: str
) -> list:
    """Stage 1: four stateful detail queries over the page stream."""
    queries = []
    pg = page_stream(spark, dwd_dir)

    # UV detail (sessions-only first-per-day per mid,
    # DwdTrafficUniqueVisitorDetail.java:72-116)
    sess = (
        pg.filter(F.col("page.last_page_id").isNull())
        .select(
            F.col("common.mid").alias("mid"),
            *_flat_dims(pg),
            F.col("ts"),
            F.timestamp_millis(F.col("ts")).alias("event_time"),
        )
        .withWatermark("event_time", "3 seconds")
    )
    uv = streaming_first_per_day(
        sess,
        key="mid",
        ts_col="event_time",
        out_schema=(
            "mid string, vc string, ch string, ar string,"
            " is_new string, ts long"
        ),
        out_cols=["mid", *_DIM_COLS, "ts"],
    )
    queries.append(
        _start_append_parquet(
            uv,
            os.path.join(dwd_dir, "dwd_traffic_uv_detail"),
            os.path.join(ckpt_dir, "uv_detail"),
        )
    )

    # jump-out detail (CEP + timeout, DwdTrafficUserJumpDetail.java:104-153)
    rows = (
        page_stream(spark, dwd_dir)
        .select(
            F.col("common.mid").alias("mid"),
            *_flat_dims(pg),
            F.col("ts"),
            F.timestamp_millis(F.col("ts")).alias("event_time"),
            F.col("page.last_page_id").isNull().alias("is_start"),
        )
        .withWatermark("event_time", "3 seconds")
    )
    jump = streaming_jump_out(
        rows,
        key="mid",
        ts_col="event_time",
        start_col="is_start",
        out_schema=(
            "mid string, vc string, ch string, ar string,"
            " is_new string, ts long"
        ),
        out_cols=["mid", *_DIM_COLS, "ts"],
        timeout_seconds=10,
    )
    queries.append(
        _start_append_parquet(
            jump,
            os.path.join(dwd_dir, "dwd_traffic_user_jump_detail"),
            os.path.join(ckpt_dir, "jump_detail"),
        )
    )

    # per-page UV detail (home/good_detail first-per-day per mid+page,
    # the keyed state inside DwsTrafficPageViewWindow)
    pv = (
        page_stream(spark, dwd_dir)
        .filter(F.col("page.page_id").isin("home", "good_detail"))
        .select(
            F.col("common.mid").alias("mid"),
            F.col("page.page_id").alias("page_id"),
            F.col("ts"),
            F.timestamp_millis(F.col("ts")).alias("event_time"),
        )
        .withWatermark("event_time", "3 seconds")
    )
    pv_first = streaming_first_per_day(
        pv,
        key=["mid", "page_id"],
        ts_col="event_time",
        out_schema="mid string, page_id string, ts long",
        out_cols=["mid", "page_id", "ts"],
    )
    queries.append(
        _start_append_parquet(
            pv_first,
            os.path.join(dwd_dir, "dwd_traffic_pv_first_detail"),
            os.path.join(ckpt_dir, "pv_first_detail"),
        )
    )

    # login detail with back-flow gap flag (the keyed state inside
    # DwsUserUserLoginWindow.java:126-181)
    logins = (
        page_stream(spark, dwd_dir)
        .filter(
            F.col("common.uid").isNotNull()
            & (
                F.col("page.last_page_id").isNull()
                | (F.col("page.page_id") == "login")
            )
        )
        .select(
            F.col("common.uid").alias("uid"),
            F.col("ts"),
            F.timestamp_millis(F.col("ts")).alias("event_time"),
        )
        .withWatermark("event_time", "3 seconds")
    )
    login = streaming_first_per_day_gap(
        logins,
        key="uid",
        ts_col="event_time",
        out_schema="uid string, ts long, is_back int",
        out_cols=["uid", "ts"],
        min_gap_days=8,
    )
    queries.append(
        _start_append_parquet(
            login,
            os.path.join(dwd_dir, "dwd_user_login_detail"),
            os.path.join(ckpt_dir, "login_detail"),
        )
    )
    return queries


def _detail_stream(
    spark: SparkSession, dwd_dir: str, table: str, schema: str
) -> DataFrame:
    path = os.path.join(dwd_dir, table)
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("event_time", F.timestamp_millis(F.col("ts")))
    )


def run_window_jobs(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    mode: str = "complete",
    watermark: str | None = None,
) -> list:
    """Stage 2: the four windowed DWS queries over the detail/page
    streams — complete-mode materialized views by default, or bounded-
    state watermarked append with ``mode="append"`` (see module
    docstring; use distinct dws/ckpt dirs per mode, the state formats
    and sink layouts are not interchangeable). ``watermark`` overrides
    the append-mode delay (default ``_WINDOW_WM``)."""
    wm = _window_mode(mode, watermark)
    queries = []
    flat_schema = (
        "mid string, vc string, ch string, ar string,"
        " is_new string, ts long"
    )

    # 1. keyword window (tokenize + explode + tumble,
    # DwsTrafficSourceKeywordPageViewWindow.java:81-113)
    pg = page_stream(spark, dwd_dir)
    search = pg.filter(
        (F.col("page.last_page_id") == "search")
        & (F.col("page.item_type") == "keyword")
        & F.col("page.item").isNotNull()
    )
    words = search.select(
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.explode(tokenize(F.col("page.item"))).alias("keyword"),
    )
    kw = tumble_agg(
        words,
        "event_time",
        WINDOW,
        ["keyword"],
        {"keyword_count": F.count(F.lit(1))},
        watermark=wm,
    ).withColumn("source", F.lit("SEARCH"))
    queries.append(
        _start_window(
            kw,
            os.path.join(dws_dir, DWS_TABLES[0]),
            os.path.join(ckpt_dir, "kw_window"),
            mode,
        )
    )

    # 2. vc/ch/ar/is_new multi-measure window (pv + uv + jump union,
    # DwsTrafficVcChArIsNewPageViewWindow.java:225-280; jump rows shift
    # +10 s so the timeout lands in the window where it fired, :146)
    pv = page_stream(spark, dwd_dir).select(
        *_flat_dims(pg),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.lit(0).alias("uv_ct"),
        F.when(F.col("page.last_page_id").isNull(), 1)
        .otherwise(0)
        .alias("sv_ct"),
        F.lit(1).alias("pv_ct"),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("dur_sum"),
        F.lit(0).alias("uj_ct"),
    )

    def measures(df, uv_ct, uj_ct):
        return df.select(
            *_DIM_COLS,
            "event_time",
            F.lit(uv_ct).alias("uv_ct"),
            F.lit(0).alias("sv_ct"),
            F.lit(0).alias("pv_ct"),
            F.lit(0).cast("long").alias("dur_sum"),
            F.lit(uj_ct).alias("uj_ct"),
        )

    uvb = measures(
        _detail_stream(spark, dwd_dir, "dwd_traffic_uv_detail", flat_schema),
        1,
        0,
    )
    jb = measures(
        _detail_stream(
            spark, dwd_dir, "dwd_traffic_user_jump_detail", flat_schema
        ).withColumn(
            "event_time",
            F.col("event_time") + F.expr("INTERVAL 10 SECONDS"),
        ),
        0,
        1,
    )
    unioned = pv.unionByName(uvb).unionByName(jb)
    vc = tumble_agg(
        unioned,
        "event_time",
        WINDOW,
        _DIM_COLS,
        {
            "uv_ct": F.sum("uv_ct"),
            "sv_ct": F.sum("sv_ct"),
            "pv_ct": F.sum("pv_ct"),
            "dur_sum": F.sum("dur_sum"),
            "uj_ct": F.sum("uj_ct"),
        },
        watermark=wm,
    )
    queries.append(
        _start_window(
            vc,
            os.path.join(dws_dir, DWS_TABLES[1]),
            os.path.join(ckpt_dir, "vc_window"),
            mode,
        )
    )

    # 3. home/good_detail UV window over the per-page UV detail
    pvf = _detail_stream(
        spark,
        dwd_dir,
        "dwd_traffic_pv_first_detail",
        "mid string, page_id string, ts long",
    )
    pv_win = tumble_agg(
        pvf,
        "event_time",
        WINDOW,
        [],
        {
            "home_uv_ct": F.sum(
                F.when(F.col("page_id") == "home", 1).otherwise(0)
            ),
            "good_detail_uv_ct": F.sum(
                F.when(F.col("page_id") == "good_detail", 1).otherwise(0)
            ),
        },
        watermark=wm,
    )
    queries.append(
        _start_window(
            pv_win,
            os.path.join(dws_dir, DWS_TABLES[2]),
            os.path.join(ckpt_dir, "pv_window"),
            mode,
        )
    )

    # 4. login window over the gap-flagged login detail
    lg = _detail_stream(
        spark,
        dwd_dir,
        "dwd_user_login_detail",
        "uid string, ts long, is_back int",
    )
    lg_win = tumble_agg(
        lg,
        "event_time",
        WINDOW,
        [],
        {"uu_ct": F.count(F.lit(1)), "back_ct": F.sum("is_back")},
        watermark=wm,
    )
    queries.append(
        _start_window(
            lg_win,
            os.path.join(dws_dir, DWS_TABLES[3]),
            os.path.join(ckpt_dir, "login_window"),
            mode,
        )
    )
    return queries


def run_traffic_user_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> dict[str, str]:
    """Run the full log-side DWS chain once (availableNow): detail stage,
    then window stage. Re-runnable: checkpoints make each stage resume
    from unprocessed files only. Returns {dws_table: path}.
    ``auto_compact``: small-file threshold for post-run compaction of
    the terminal DWS table dirs (None = off; see _auto_compact)."""
    _recover_compaction_targets(
        os.path.join(dws_dir, t) for t in DWS_TABLES
    )
    for q in run_detail_jobs(spark, dwd_dir, ckpt_dir):
        q.awaitTermination()
    # ensure detail dirs exist even when a stage-1 query emitted 0 rows
    # (schema peek in stage 2 needs the directory)
    for q in run_window_jobs(
        spark, dwd_dir, dws_dir, ckpt_dir, mode=mode, watermark=watermark
    ):
        q.awaitTermination()
    out = {t: os.path.join(dws_dir, t) for t in DWS_TABLES}
    _auto_compact(spark, out.values(), auto_compact)
    return out


# ---------------------------------------------------------------------------
# db-side always-on DWS jobs — the three insert-only chains (register,
# cart-add UU, payment-suc). The changelog-consuming windows (order /
# province / trademark) get their retraction semantics from dedicated
# stateful dedup stages further down (run_trade_order_dws and friends),
# which turn the changelog into insert-only detail streams; they support
# the same complete/append modes as the chains here.
TRADE_DWS_TABLES = (
    "dws_user_user_register_window",
    "dws_trade_cart_add_uu_window",
    "dws_trade_payment_suc_window",
)


def _peek_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)


def run_trade_detail_jobs(
    spark: SparkSession, dwd_dir: str, ckpt_dir: str
) -> list:
    """Stage 1: stateful unique-user detail queries over insert-only
    DWD fact streams."""
    from .stateful import streaming_first_per_day_ever

    queries = []

    cart = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_trade_cart_add")
    ).select(
        F.col("user_id"),
        F.col("id"),
        F.timestamp_seconds(F.col("ts").cast("long")).alias("event_time"),
        F.col("ts").cast("long").alias("sec"),
    ).withWatermark("event_time", "3 seconds")
    cart_first = streaming_first_per_day(
        cart,
        key="user_id",
        ts_col="event_time",
        out_schema="user_id string, sec long",
        out_cols=["user_id", "sec"],
    )
    queries.append(
        _start_append_parquet(
            cart_first,
            os.path.join(dwd_dir, "dwd_trade_cart_first_detail"),
            os.path.join(ckpt_dir, "cart_first"),
        )
    )

    pay = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_trade_pay_detail_suc")
    ).select(
        F.col("pay_user_id"),
        F.to_timestamp("callback_time").alias("event_time"),
        F.unix_timestamp(F.to_timestamp("callback_time")).alias("sec"),
    ).withWatermark("event_time", "3 seconds")
    pay_first = streaming_first_per_day_ever(
        pay,
        key="pay_user_id",
        ts_col="event_time",
        out_schema="pay_user_id string, sec long, is_first_ever int",
        out_cols=["pay_user_id", "sec"],
    )
    queries.append(
        _start_append_parquet(
            pay_first,
            os.path.join(dwd_dir, "dwd_trade_pay_first_detail"),
            os.path.join(ckpt_dir, "pay_first"),
        )
    )
    return queries


def run_trade_window_jobs(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    mode: str = "complete",
    watermark: str | None = None,
) -> list:
    """Stage 2: the three windowed summaries — complete-mode materialized
    views by default, bounded-state watermarked append with
    ``mode="append"`` (module docstring). ``watermark`` overrides the
    append-mode delay — these db-side sources are not the 3 s
    bounded-out-of-orderness log stream, so tune as needed."""
    wm = _window_mode(mode, watermark)
    queries = []

    reg = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_user_register")
    ).withColumn("event_time", F.to_timestamp("create_time"))
    reg_win = tumble_agg(
        reg,
        "event_time",
        WINDOW,
        [],
        {"register_ct": F.count(F.lit(1))},
        watermark=wm,
    )
    queries.append(
        _start_window(
            reg_win,
            os.path.join(dws_dir, TRADE_DWS_TABLES[0]),
            os.path.join(ckpt_dir, "register_window"),
            mode,
        )
    )

    cart_first = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_trade_cart_first_detail")
    ).withColumn("event_time", F.timestamp_seconds(F.col("sec")))
    cart_win = tumble_agg(
        cart_first,
        "event_time",
        WINDOW,
        [],
        {"cart_add_uu_ct": F.count(F.lit(1))},
        watermark=wm,
    )
    queries.append(
        _start_window(
            cart_win,
            os.path.join(dws_dir, TRADE_DWS_TABLES[1]),
            os.path.join(ckpt_dir, "cart_window"),
            mode,
        )
    )

    pay_first = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_trade_pay_first_detail")
    ).withColumn("event_time", F.timestamp_seconds(F.col("sec")))
    pay_win = tumble_agg(
        pay_first,
        "event_time",
        WINDOW,
        [],
        {
            "payment_suc_unique_user_count": F.count(F.lit(1)),
            "payment_suc_new_user_count": F.sum("is_first_ever"),
        },
        watermark=wm,
    )
    queries.append(
        _start_window(
            pay_win,
            os.path.join(dws_dir, TRADE_DWS_TABLES[2]),
            os.path.join(ckpt_dir, "pay_window"),
            mode,
        )
    )
    return queries


def run_trade_user_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> dict[str, str]:
    """Run the insert-only db-side DWS chains once (availableNow);
    re-runnable with the same checkpoints."""
    _recover_compaction_targets(
        os.path.join(dws_dir, t) for t in TRADE_DWS_TABLES
    )
    for q in run_trade_detail_jobs(spark, dwd_dir, ckpt_dir):
        q.awaitTermination()
    for q in run_trade_window_jobs(
        spark, dwd_dir, dws_dir, ckpt_dir, mode=mode, watermark=watermark
    ):
        q.awaitTermination()
    out = {t: os.path.join(dws_dir, t) for t in TRADE_DWS_TABLES}
    _auto_compact(spark, out.values(), auto_compact)
    return out


# ---------------------------------------------------------------------------
# W4 in its home job: DwsTrafficVcChArIsNewPageViewWindow carries
# allowedLateness(10s) (java:235-237). This runner replaces the
# complete-mode window query with the accumulating late-window corrector
# (streaming/lateness.py): in-horizon late page views RE-FIRE their
# window with corrected totals, later ones land in the late/ side output.
# All five measures are additive, the requirement for corrector merges.
def run_vc_window_with_lateness(
    spark: SparkSession,
    dwd_dir: str,
    target_dir: str,
    ckpt: str,
    allowed_lateness: str = "10 seconds",
):
    from .jobs import start_foreach_batch
    from .lateness import late_window_sink

    pg = page_stream(spark, dwd_dir)
    pv = pg.select(
        *_flat_dims(pg),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.lit(0).alias("uv_ct"),
        F.when(F.col("page.last_page_id").isNull(), 1)
        .otherwise(0)
        .alias("sv_ct"),
        F.lit(1).alias("pv_ct"),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("dur_sum"),
        F.lit(0).alias("uj_ct"),
    )
    sink = late_window_sink(
        target_dir,
        "event_time",
        WINDOW,
        _DIM_COLS,
        {
            "uv_ct": F.sum("uv_ct"),
            "sv_ct": F.sum("sv_ct"),
            "pv_ct": F.sum("pv_ct"),
            "dur_sum": F.sum("dur_sum"),
            "uj_ct": F.sum("uj_ct"),
        },
        allowed_lateness=allowed_lateness,
    )
    return start_foreach_batch(pv, sink, ckpt)


# ---------------------------------------------------------------------------
# The changelog-consuming trade order window as a streaming chain. The
# reference job (DwsTradeOrderWindow) is keyed-state dedup (5 s timer,
# latest revision wins) -> per-user first/first-ever state -> tumbling
# multi-measure window. Same three stages here, each a checkpointed query:
# dedup detail (streaming_latest_per_key) -> user-first detail
# (streaming_first_per_day_ever) -> union window (amount measures from the
# deduped stream, user measures from the firsts stream — the full-join +
# zero-fill of the batch twin expressed as a single additive window).
ORDER_DEDUP_COLS = [
    "id", "order_id", "user_id", "province_id", "sku_id", "ts",
    "sku_num", "order_price", "split_activity_amount",
    "split_coupon_amount", "split_total_amount", "row_op_ts",
]
ORDER_DWS_TABLE = "dws_trade_order_window"


def run_trade_order_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> str:
    from .stateful import (
        streaming_first_per_day_ever,
        streaming_latest_per_key,
    )

    wm = _window_mode(mode, watermark)
    _recover_compaction_targets([os.path.join(dws_dir, ORDER_DWS_TABLE)])

    # stage 1: latest-wins revision dedup per order-detail id
    src = (
        _peek_stream(spark, os.path.join(dwd_dir, "dwd_trade_order_detail"))
        .select(
            *ORDER_DEDUP_COLS,
            F.timestamp_seconds(F.col("ts").cast("long")).alias(
                "event_time"
            ),
        )
        .withWatermark("event_time", "3 seconds")
    )
    ded = streaming_latest_per_key(
        src,
        key="id",
        ts_col="event_time",
        order_by=["row_op_ts", "ts"],
        out_schema=(
            "id string, order_id string, user_id string,"
            " province_id string, sku_id string, ts string,"
            " sku_num string, order_price string,"
            " split_activity_amount string, split_coupon_amount string,"
            " split_total_amount string, row_op_ts long"
        ),
        out_cols=ORDER_DEDUP_COLS,
    )
    dedup_path = os.path.join(dwd_dir, "dwd_trade_order_detail_dedup")
    _start_append_parquet(
        ded, dedup_path, os.path.join(ckpt_dir, "order_dedup")
    ).awaitTermination()

    # stage 2: per-user first-per-day + first-ever over the deduped stream
    dd = (
        _peek_stream(spark, dedup_path)
        .select(
            "user_id",
            F.col("ts").cast("long").alias("sec"),
            F.timestamp_seconds(F.col("ts").cast("long")).alias(
                "event_time"
            ),
        )
        .withWatermark("event_time", "3 seconds")
    )
    firsts = streaming_first_per_day_ever(
        dd,
        key="user_id",
        ts_col="event_time",
        out_schema="user_id string, sec long, is_first_ever int",
        out_cols=["user_id", "sec"],
    )
    firsts_path = os.path.join(dwd_dir, "dwd_trade_order_user_first_detail")
    _start_append_parquet(
        firsts, firsts_path, os.path.join(ckpt_dir, "order_firsts")
    ).awaitTermination()

    # stage 3: one additive window over the union of both detail streams
    d16 = "decimal(16,2)"
    amounts = _peek_stream(spark, dedup_path).select(
        F.timestamp_seconds(F.col("ts").cast("long")).alias("event_time"),
        F.lit(0).alias("uu"),
        F.lit(0).alias("first_ever"),
        F.col("split_activity_amount").cast(d16).alias("activity"),
        F.col("split_coupon_amount").cast(d16).alias("coupon"),
        (
            F.col("sku_num").cast(d16) * F.col("order_price").cast(d16)
        ).alias("origin"),
    )
    users = _peek_stream(spark, firsts_path).select(
        F.timestamp_seconds(F.col("sec")).alias("event_time"),
        F.lit(1).alias("uu"),
        F.col("is_first_ever").alias("first_ever"),
        F.lit(0).cast(d16).alias("activity"),
        F.lit(0).cast(d16).alias("coupon"),
        F.lit(0).cast("decimal(33,4)").alias("origin"),
    )
    win = tumble_agg(
        amounts.unionByName(users),
        "event_time",
        WINDOW,
        [],
        {
            "order_unique_user_count": F.sum("uu").cast("long"),
            "order_new_user_count": F.sum("first_ever").cast("long"),
            "order_activity_reduce_amount": F.sum("activity").cast("double"),
            "order_coupon_reduce_amount": F.sum("coupon").cast("double"),
            "order_origin_total_amount": F.sum("origin").cast("double"),
        },
        watermark=wm,
    )
    target = os.path.join(dws_dir, ORDER_DWS_TABLE)
    _start_window(
        win, target, os.path.join(ckpt_dir, "order_window"), mode
    ).awaitTermination()
    _auto_compact(spark, [target], auto_compact)
    return target


# ---------------------------------------------------------------------------
# The province window (distinct-order count + amount sum per province) as
# a streaming chain sharing the order chain's dedup detail. Spark
# streaming has no exact countDistinct — the reference holds a per-window
# order-id set in state (DwsTradeProvinceOrderWindow); the streaming-
# native form is the same trick one level down: a first-arrival dedup on
# order_id (dropDuplicatesWithinWatermark — bounded state, the TTL'd set
# analog) emits one row per order, and the window then COUNTS. Amounts
# sum over all detail rows; both measure families union into one additive
# window. The province dim joins as a broadcast stream-static join —
# batch-side inside the complete-mode sink (per trigger), in-stream
# before the exactly-once parquet sink in append mode.
PROVINCE_DWS_TABLE = "dws_trade_province_order_window"


def run_trade_province_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    dim_base_province: DataFrame,
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> str:
    from .jobs import streaming_dedup

    wm = _window_mode(mode, watermark)
    _recover_compaction_targets([os.path.join(dws_dir, PROVINCE_DWS_TABLE)])

    dedup_path = os.path.join(dwd_dir, "dwd_trade_order_detail_dedup")

    # stage 1: one row per order (first detail row wins; an order's
    # details share create_time/province, so any representative works)
    dd = (
        _peek_stream(spark, dedup_path)
        .withColumn(
            "event_time",
            F.timestamp_seconds(F.col("ts").cast("long")),
        )
    )
    per_order = streaming_dedup(
        dd.select("order_id", "province_id", "event_time"),
        keys=["order_id"],
        ts_col="event_time",
        watermark="10 seconds",
    )
    per_order_path = os.path.join(dwd_dir, "dwd_trade_order_per_order")
    _start_append_parquet(
        per_order, per_order_path, os.path.join(ckpt_dir, "per_order")
    ).awaitTermination()

    # stage 2: additive union window (counts from the per-order stream,
    # amounts from the full detail stream)
    d16 = "decimal(16,2)"
    amounts = _peek_stream(spark, dedup_path).select(
        F.col("province_id"),
        F.timestamp_seconds(F.col("ts").cast("long")).alias("event_time"),
        F.lit(0).alias("ord"),
        F.col("split_total_amount").cast(d16).alias("amount"),
    )
    orders = _peek_stream(spark, per_order_path).select(
        F.col("province_id"),
        F.col("event_time"),
        F.lit(1).alias("ord"),
        F.lit(0).cast(d16).alias("amount"),
    )
    win = tumble_agg(
        amounts.unionByName(orders),
        "event_time",
        WINDOW,
        ["province_id"],
        {
            "order_count": F.sum("ord").cast("long"),
            "order_amount": F.sum("amount").cast("double"),
        },
        watermark=wm,
    )
    dim = dim_base_province.select(
        F.col("id").alias("__pid"), F.col("name").alias("province_name")
    )

    target = os.path.join(dws_dir, PROVINCE_DWS_TABLE)
    ckpt = os.path.join(ckpt_dir, "province_window")

    if mode == "append":
        # stateless stream-static broadcast join after the watermarked
        # agg; the parquet sink keeps exactly-once via _spark_metadata
        out = win.join(
            F.broadcast(dim), win["province_id"] == F.col("__pid"), "left"
        ).drop("__pid")
        _start_append_parquet(out, target, ckpt).awaitTermination()
        _auto_compact(spark, [target], auto_compact)
        return target

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = batch.join(
            F.broadcast(dim), batch["province_id"] == F.col("__pid"), "left"
        ).drop("__pid")
        out.write.mode("overwrite").parquet(target)

    q = (
        win.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _auto_compact(spark, [target], auto_compact)
    return target


# ---------------------------------------------------------------------------
# The trademark/category windows — the last two changelog-consuming DWS
# tables — as streaming chains. Same recipe as the province window:
# countDistinct(order_id) per (user, sku) becomes a first-arrival dedup
# on (order_id, sku_id) feeding a countable stream; the post-aggregate
# dim cascade (6 hops spu / 5 hops refund, all broadcast stream-static
# joins) runs batch-side inside the complete-mode sink per trigger, or
# in-stream ahead of the exactly-once parquet sink in append mode —
# sharing the cascade spec with the batch twin
# (gmall.dws.tm_spu_cascade / tm_refund_cascade).
TM_SPU_DWS_TABLE = "dws_trade_trademark_category_user_spu_order_window"
TM_REFUND_DWS_TABLE = "dws_trade_trademark_category_user_refund_window"


def _cascade_sink(
    win: DataFrame,
    cascade,
    target: str,
    ckpt: str,
    mode: str,
    auto_compact: int | None = None,
):
    if mode == "append":
        # the cascade is a chain of stateless broadcast lookups — apply
        # it to the streaming aggregate and let the parquet sink keep
        # exactly-once
        q = _start_append_parquet(cascade(win), target, ckpt)
        q.awaitTermination()
        _auto_compact(win.sparkSession, [target], auto_compact)
        return target

    def sink(batch: DataFrame, batch_id: int) -> None:
        cascade(batch).write.mode("overwrite").parquet(target)

    q = (
        win.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _auto_compact(win.sparkSession, [target], auto_compact)
    return target


def run_trade_tm_spu_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    dims: dict[str, DataFrame],
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> str:
    from ..gmall.dws import tm_spu_cascade
    from .jobs import streaming_dedup

    wm = _window_mode(mode, watermark)
    _recover_compaction_targets([os.path.join(dws_dir, TM_SPU_DWS_TABLE)])
    dedup_path = os.path.join(dwd_dir, "dwd_trade_order_detail_dedup")

    dd = _peek_stream(spark, dedup_path).withColumn(
        "event_time", F.timestamp_seconds(F.col("ts").cast("long"))
    )
    per_osku = streaming_dedup(
        dd.select("order_id", "sku_id", "user_id", "event_time"),
        keys=["order_id", "sku_id"],
        ts_col="event_time",
        watermark="10 seconds",
    )
    per_osku_path = os.path.join(dwd_dir, "dwd_trade_order_sku_detail")
    _start_append_parquet(
        per_osku, per_osku_path, os.path.join(ckpt_dir, "per_osku")
    ).awaitTermination()

    d16 = "decimal(16,2)"
    amounts = _peek_stream(spark, dedup_path).select(
        "user_id",
        "sku_id",
        F.timestamp_seconds(F.col("ts").cast("long")).alias("event_time"),
        F.lit(0).alias("ord"),
        F.col("split_total_amount").cast(d16).alias("amount"),
    )
    counts = _peek_stream(spark, per_osku_path).select(
        "user_id",
        "sku_id",
        "event_time",
        F.lit(1).alias("ord"),
        F.lit(0).cast(d16).alias("amount"),
    )
    win = tumble_agg(
        amounts.unionByName(counts),
        "event_time",
        WINDOW,
        ["user_id", "sku_id"],
        {
            "order_count": F.sum("ord").cast("long"),
            "order_amount": F.sum("amount").cast("double"),
        },
        watermark=wm,
    )
    return _cascade_sink(
        win,
        lambda b: tm_spu_cascade(b, dims),
        os.path.join(dws_dir, TM_SPU_DWS_TABLE),
        os.path.join(ckpt_dir, "tm_spu_window"),
        mode,
        auto_compact,
    )


def run_trade_tm_refund_dws(
    spark: SparkSession,
    dwd_dir: str,
    dws_dir: str,
    ckpt_dir: str,
    dims: dict[str, DataFrame],
    mode: str = "complete",
    watermark: str | None = None,
    auto_compact: int | None = None,
) -> str:
    from ..gmall.dws import tm_refund_cascade
    from .jobs import streaming_dedup

    wm = _window_mode(mode, watermark)
    _recover_compaction_targets([os.path.join(dws_dir, TM_REFUND_DWS_TABLE)])

    # order_refund is an insert-only DWD extract (no revisions), so the
    # only stateful stage is the per-(order, sku) first-arrival dedup
    src = _peek_stream(
        spark, os.path.join(dwd_dir, "dwd_trade_order_refund")
    ).withColumn(
        "event_time", F.timestamp_seconds(F.col("ts").cast("long"))
    )
    per_osku = streaming_dedup(
        src.select("order_id", "sku_id", "user_id", "event_time"),
        keys=["order_id", "sku_id"],
        ts_col="event_time",
        watermark="10 seconds",
    )
    per_path = os.path.join(dwd_dir, "dwd_trade_refund_sku_detail")
    _start_append_parquet(
        per_osku, per_path, os.path.join(ckpt_dir, "refund_osku")
    ).awaitTermination()

    win = tumble_agg(
        _peek_stream(spark, per_path),
        "event_time",
        WINDOW,
        ["user_id", "sku_id"],
        {"refund_count": F.count(F.lit(1)).cast("long")},
        watermark=wm,
    )
    return _cascade_sink(
        win,
        lambda b: tm_refund_cascade(b, dims),
        os.path.join(dws_dir, TM_REFUND_DWS_TABLE),
        os.path.join(ckpt_dir, "tm_refund_window"),
        mode,
        auto_compact,
    )
