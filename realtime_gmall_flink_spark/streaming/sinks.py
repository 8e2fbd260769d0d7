"""Streaming sinks (SURVEY 2.2 K1-K6).

Kafka writers mirror KafkaUtil.getKafkaProducer / the upsert-kafka DDLs:
rows are serialized to a JSON ``value`` (and optional ``key`` for keyed
changelog topics). The exactly-once transactional producer of the
reference maps to checkpointed at-least-once delivery + keyed idempotent
consumers (QUIRKS.md); jobs.upsert_sink provides the keyed-collapse side.

``kafka_payload`` is pure DataFrame shaping, testable without a broker;
``write_kafka`` attaches the transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_payload(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Serialize all columns to a JSON value (+ concatenated key for keyed
    topics) — the JSON format of the reference's Kafka DDLs."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_cols:
        cols.insert(0, F.concat_ws("|", *[F.col(c) for c in key_cols]).alias("key"))
    return df.select(*cols)


def write_kafka(
    df: DataFrame,
    topic: str,
    brokers: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
):
    """K1/K2: start a Kafka writeStream (requires a broker + the Kafka
    connector package at runtime)."""
    payload = kafka_payload(df, key_cols)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_console(df: DataFrame, truncate: bool = False):
    """K6: the .print() debug sink."""
    return (
        df.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .start()
    )
