"""Log-side DWD pipeline (reference: app/dwd/log/*).

BaseLogApp (BaseLogApp.java:40-287): parse topic_log JSON, route dirty
rows, repair the is_new flag with per-mid first-date state, split into
page/start/display/action/err streams.

DwdTrafficUniqueVisitorDetail (:86-116): first page-view per mid per day.
DwdTrafficUserJumpDetail (:104-147): CEP jump-out (session-start followed
by session-start or 10 s silence).

Batch forms below; streaming variants reuse these column expressions with
the stateful operators in streaming.stateful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.jumpout import jump_out_batch
from ..operators.visitor import first_per_period, first_visit_repair
from ..schemas import TOPIC_LOG_SCHEMA

JUMP_TIMEOUT_S = 10  # within(Time.seconds(10)), DwdTrafficUserJumpDetail.java:120


def parse_topic_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value string -> parsed struct column set + __dirty flag (P1/P2).

    A row is dirty when the JSON fails to parse — the analog of the
    reference's try/catch side-output. PERMISSIVE from_json surfaces parse
    failures via the corrupt-record column (Spark returns an all-null
    struct, not a null struct, for malformed input).
    """
    # fresh StructType: .add() would mutate the shared registry schema
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        TOPIC_LOG_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
    )
    parsed = raw.withColumn(
        "__j",
        F.from_json(
            F.col(value_col),
            schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return parsed.select(
        F.col(value_col).alias("raw"),
        F.col("__j.*"),
        F.col("__j._corrupt_record").isNotNull().alias("__dirty"),
    ).drop("_corrupt_record")


def repair_is_new(log: DataFrame) -> DataFrame:
    """D4: common.is_new repaired against per-mid first date.

    The reference keeps ValueState<firstViewDt> keyed by mid
    (BaseLogApp.java:109-149); batch equivalent is min(date) over mid.
    ``event_time`` is derived from the epoch-ms ``ts``.
    """
    with_time = log.withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    ).withColumn("mid", F.col("common.mid"))
    repaired = first_visit_repair(with_time, "mid", "event_time", "is_new_fixed")
    # keep claimed 0 as 0 even on the first observed date (an old visitor's
    # first day in our data window must not flip to 1 — the reference
    # backfills state to yesterday instead, same outcome)
    return repaired.withColumn(
        "is_new_fixed",
        F.when(F.col("common.is_new") == "0", F.lit(0)).otherwise(
            F.col("is_new_fixed")
        ),
    )


def split_log(log: DataFrame) -> dict[str, DataFrame]:
    """K5/U2: the 5-way side-output split + dirty, as filtered projections.

    err: any record carrying err; start: startup records; page: page views;
    display/action: page records exploded per array element with page/common
    context lifted alongside (P8).
    """
    clean = log.filter(~F.col("__dirty"))
    page = clean.filter(
        F.col("page").isNotNull() & F.col("start").isNull()
    )
    out = {
        "dirty": log.filter(F.col("__dirty")).select("raw"),
        "err": clean.filter(F.col("err").isNotNull()),
        "start": clean.filter(F.col("start").isNotNull()),
        "page": page,
        "display": page.filter(F.col("displays").isNotNull()).select(
            "common",
            "page",
            "ts",
            F.explode("displays").alias("display"),
        ),
        "action": page.filter(F.col("actions").isNotNull()).select(
            "common",
            "page",
            "ts",
            F.explode("actions").alias("action"),
        ),
    }
    return out


def unique_visitor_detail(page: DataFrame) -> DataFrame:
    """A6: first page-view per mid per day, sessions-only filter first
    (last_page_id is null), like DwdTrafficUniqueVisitorDetail.java:72-75.
    """
    sess = page.filter(F.col("page.last_page_id").isNull())
    with_cols = sess.withColumn("mid", F.col("common.mid")).withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    )
    return first_per_period(
        with_cols, "mid", "event_time", tiebreak=("ts",)
    ).drop("event_time")


def user_jump_detail(page: DataFrame) -> DataFrame:
    """W5: jump-out rows.

    Pattern per the reference: a session-start page (last_page_id null)
    bounces when followed by another session-start, or by nothing within
    10 s. Timed-out partial matches are emitted too (the CEP timeout
    side-output union, :153) — in the lead() form both cases collapse to
    the same predicate.
    """
    with_cols = page.withColumn("mid", F.col("common.mid")).withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    )
    jumps = jump_out_batch(
        with_cols,
        key="mid",
        ts_col="event_time",
        is_session_start=F.col("page.last_page_id").isNull(),
        timeout_seconds=JUMP_TIMEOUT_S,
        tiebreak="ts",
    )
    return jumps.drop("event_time")
