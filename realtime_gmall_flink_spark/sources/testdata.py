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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    types = dict(df.dtypes)
    for col in _NANOS_COLS.get(name, ()):
        if types.get(col) == "bigint":
            df = df.withColumn(col, _nanos_to_ntz(col))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
