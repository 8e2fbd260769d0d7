"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``realtime_gmall_flink_spark.plans.catalog``;
this module just adapts it to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_gmall_flink_spark.plans.catalog import catalog
from realtime_gmall_flink_spark.session import configure_runtime


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the cascaded-dimension
    revenue rollup (SURVEY J5/A7/A1 — the trademark/category cascade
    analog)."""
    configure_runtime(spark)
    q = catalog()["dim_cascade_region_revenue"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md section 2."""

    def wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_runtime(spark)
            return builder(spark, sf_dir)

        return run

    return {name: wrap(q.builder) for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: q.oracle for name, q in catalog().items() if q.oracle is not None
    }
