"""SparkSession factory.

Replaces the reference's per-job StreamExecutionEnvironment boilerplate
(reference: app/dwd/log/BaseLogApp.java:42-57 — parallelism 4, 3 s
EXACTLY_ONCE checkpoints, HashMap state backend). On Spark the equivalents
are AQE + shuffle-partition sizing + structured-streaming checkpoints; we
centralize them here.

Scale posture (100 TB target):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch to broadcast.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly 32 but is
  meant to be overridden to ~2-3x total cores on a real cluster.
- Arrow enabled so any Pandas-UDF path is vectorized.
- ``nanosAsLong`` because the driver's parquet uses TIMESTAMP(NANOS), which
  the Spark reader otherwise rejects; sources.testdata converts to
  TIMESTAMP_NTZ losslessly (microsecond truncation, matching DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that the engine depends on. Applied both at build
# time and defensively at runtime (configure_runtime) because the driver may
# hand us an already-built session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Partition-dir listing: the persisted index layouts are
    # metadata-sized trees of a few hundred ``name=value`` dirs
    # (bkt_hi buckets, IVF cells), but the default threshold (32)
    # launches a DISTRIBUTED listing job per open — a 256-task job
    # costing ~0.5 s against directories a driver scandir walks in
    # milliseconds (measured: semantic_dedup_clusters paid two such
    # jobs per call). Raised, not unbounded: a genuinely huge layout
    # (>SPARK_GRAFT_LIST_THRESHOLD paths, e.g. a 100 TB object-store
    # table) still lists distributed.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": os.environ.get(
        "SPARK_GRAFT_LIST_THRESHOLD", "4096"
    ),
}

BUILD_CONFS: dict[str, str] = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    # The reference pins GMT+8 (DwdTradeOrderPreProcess.java:54); our catalog
    # works on TIMESTAMP_NTZ so results are tz-independent, but gmall
    # pipelines that format epoch-ms use an explicit zone (functions.datetime).
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "realtime-gmall-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    spark = builder.getOrCreate()
    configure_runtime(spark)
    return spark


def configure_runtime(spark: SparkSession) -> None:
    """Apply runtime-settable confs to an externally provided session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-modifiable in this deployment; engine still works
