"""DIM layer: table_process-driven dimension routing
(reference: app/dim/DimSinkApp.java + app/func/MyBroadcastFunction.java).

The reference broadcasts the config table, routes each topic_db record to a
Phoenix dim table, prunes columns to the config allowlist, and upserts by
PK with a Redis cache-aside layer. Spark-first: broadcast-join routing +
column pruning (operators.routing), with plain parquet/in-memory tables
replacing Phoenix, and PK-upsert realized as latest-row dedup on the
envelope order (the cache layer is obsolete — joins are set-oriented).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import latest_row_per_key
from ..operators.routing import routed_tables

# Default routing config — the reference's gmall_config.table_process rows
# for the dims the DWS jobs actually read (FIXTURES.md section 4/5).
DEFAULT_TABLE_PROCESS: tuple[Mapping[str, str], ...] = (
    {"source_table": "base_province", "sink_table": "dim_base_province",
     "sink_columns": "id,name", "sink_pk": "id"},
    {"source_table": "sku_info", "sink_table": "dim_sku_info",
     "sink_columns": "id,tm_id,category3_id,spu_id,sku_name", "sink_pk": "id"},
    {"source_table": "spu_info", "sink_table": "dim_spu_info",
     "sink_columns": "id,spu_name", "sink_pk": "id"},
    {"source_table": "base_trademark", "sink_table": "dim_base_trademark",
     "sink_columns": "id,tm_name", "sink_pk": "id"},
    {"source_table": "base_category3", "sink_table": "dim_base_category3",
     "sink_columns": "id,name,category2_id", "sink_pk": "id"},
    {"source_table": "base_category2", "sink_table": "dim_base_category2",
     "sink_columns": "id,name,category1_id", "sink_pk": "id"},
    {"source_table": "base_category1", "sink_table": "dim_base_category1",
     "sink_columns": "id,name", "sink_pk": "id"},
)


def build_dims(
    env: DataFrame,
    config_rows: Sequence[Mapping[str, str]] = DEFAULT_TABLE_PROCESS,
) -> dict[str, DataFrame]:
    """Route the CDC envelope into one deduped DataFrame per dim table.

    Upsert semantics: last change per PK wins, ordered by the envelope ts
    (the reference's Phoenix upsert applies changes in arrival order).
    """
    env = env.withColumn("__op_ts", F.col("ts").cast("long"))
    out: dict[str, DataFrame] = {}
    for sink, routed in routed_tables(
        env, config_rows, route_key="table"
    ).items():
        pk = next(
            r["sink_pk"] for r in config_rows if r["sink_table"] == sink
        )
        # routed_tables prunes to sink_columns; re-attach the order column
        cfg = next(r for r in config_rows if r["sink_table"] == sink)
        cols = [c.strip() for c in cfg["sink_columns"].split(",")]
        routed_with_ts = env.filter(
            F.col("table") == cfg["source_table"]
        ).select(
            *[F.col("data")[c].alias(c) for c in cols], F.col("__op_ts")
        )
        out[sink] = latest_row_per_key(
            routed_with_ts, keys=(pk,), order_by=("__op_ts",)
        ).drop("__op_ts")
    return out
