"""Streaming sources (SURVEY 2.1 S1-S6).

Kafka (S1-S3) is the reference's only real transport; here it is gated
behind availability (no broker in the test container) while file-drop and
rate/memory sources provide test transports with identical downstream
code — the DataFrame returned by every reader has the same single
``value: string`` column the Kafka reader would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    topic: str,
    brokers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1/S2: Kafka topic -> value:string stream (group-offset semantics
    are handled by the checkpoint; KafkaUtil.getKafkaConsumer analog)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-drop transport: one JSON document per line (test stand-in for a
    topic; S6)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).select(F.col("value"))


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic load source for soak tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def parquet_topic_ingest(
    spark: SparkSession,
    src_dir: str,
    ckpt: str,
    sink,
    transform=None,
):
    """The shared availableNow-ingest scaffold every score-on-arrival
    module (text, vector, media, curation) builds on: parquet topic
    dir -> schema-pinned file stream -> optional in-stream transform
    -> foreachBatch sink, exactly-once via the checkpoint. ONE
    definition so the exactly-once wiring (append mode, availableNow
    trigger) cannot drift between ingests. Returns the started
    query."""
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if transform is not None:
        stream = transform(stream)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
