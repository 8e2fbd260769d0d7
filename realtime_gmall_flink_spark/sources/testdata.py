"""Readers for the driver's TPC-H-ish parquet test tables.

The driver generates ``/root/testdata/sf*/{table}.parquet`` with
TIMESTAMP(NANOS) columns in ``events``. Spark's parquet reader rejects
nano-precision timestamps unless ``spark.sql.legacy.parquet.nanosAsLong`` is
set, in which case they surface as epoch-nanosecond longs; we convert to
TIMESTAMP_NTZ at microsecond precision (integer truncation — exactly what
DuckDB does when it reads the same files), so every timestamp the engine
processes is timezone-independent and oracle-comparable.

At 100 TB this layer is where partition pruning and column pruning attach:
all readers return plain `spark.read.parquet` DataFrames, so Catalyst pushes
filters/projections into the scan (verify with .explain → PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) that need the long->ntz conversion.
_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _nanos_to_ntz(col: str) -> F.Column:
    # div truncates toward zero for the positive epochs in play; DuckDB's
    # nanos->micros read truncates identically.
    return F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {_EPOCH_NTZ})")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = f"{sf_dir}/{name}.parquet"
    # schema resolved DRIVER-SIDE from the footer (one pyarrow read, no
    # schema-inference Spark job per table open — every catalog query
    # opens its tables per invocation, and at scale the inference pass
    # samples footers across the table). footer_spark_schema mirrors
    # exactly what inference would produce here, including the
    # nanosAsLong long surface for TIMESTAMP(NANOS) columns; any
    # unreadable/multi-file shape falls back to plain inference.
    df = None
    if os.path.isfile(path):
        try:
            from ..indexutil import footer_spark_schema

            df = spark.read.schema(footer_spark_schema(path)).parquet(path)
        except Exception:
            df = None
    if df is None:
        df = spark.read.parquet(path)
    types = dict(df.dtypes)
    for col in _NANOS_COLS.get(name, ()):
        if types.get(col) == "bigint":
            df = df.withColumn(col, _nanos_to_ntz(col))
    return df


def spread_small_scan(
    spark: SparkSession, df: DataFrame, path: str, key: str | None = None
) -> DataFrame:
    """Spread ``df`` across cores when its source file is too small
    for the scan to split (single row group at test SFs) AND the
    downstream per-row work is CPU-bound — the callers' documented
    CPU-spread. The decision is DRIVER-SIDE from the file size (a
    source smaller than cores x maxPartitionBytes cannot fill every
    core): materializing ``df.rdd`` just to count scan partitions
    costs ~0.1 s of plan conversion per call. At real scale the source
    out-sizes the threshold and this is a no-op, same as before.
    Directory tables keep the legacy partition-count probe:
    ``os.path.getsize`` on a directory returns the INODE size, which
    would classify an arbitrarily large layout as "small" and bolt a
    full exchange onto it.

    ``key``: hash-partition on this column instead of round-robin.
    The callers' downstream ops key on the row id (doc_id windows and
    groupBys after the shingle explode, vec_id reductions), so a
    keyed spread lets them reuse this exchange and drop their own —
    the dropped one carries EXPLODED rows (every token/shingle with
    its text), while this one carries each source row once. A unique
    id hashes as evenly as round-robin, so the CPU-spread is
    unchanged."""
    target = spark.sparkContext.defaultParallelism
    if os.path.isfile(path):
        small = os.path.getsize(path) < target * 128 * 1024 * 1024
    else:  # directory table / remote path: the legacy probe
        small = df.rdd.getNumPartitions() < target
    if not small:
        return df
    return df.repartition(target, key) if key else df.repartition(target)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
