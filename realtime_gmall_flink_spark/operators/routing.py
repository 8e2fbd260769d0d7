"""Config-driven routing and stream splitting (SURVEY 2.4 J6, 2.3 P9, 2.8 U2).

The reference broadcasts a ``table_process`` config table and routes each
CDC record to a sink table, pruning columns to the config's allowlist
(app/dim/DimSinkApp.java:106-114, app/func/MyBroadcastFunction.java:43-97).
Spark-first: a broadcast equi-join against the config DataFrame — the
config is tiny, so the join is map-side with zero shuffle of the fact
stream.

The 5-way side-output split of BaseLogApp (:186-285) becomes N filtered
projections of one (cached) parsed DataFrame.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def route_by_config(
    df: DataFrame,
    config: DataFrame,
    route_key: str,
    config_key: str = "source_table",
) -> DataFrame:
    """Inner-join the stream with a broadcast config; unmatched rows drop
    (the reference ignores tables absent from table_process)."""
    return df.join(
        broadcast(config), df[route_key] == config[config_key], "inner"
    )


def routed_tables(
    df: DataFrame,
    config_rows: Sequence[Mapping[str, str]],
    route_key: str,
    data_col: str = "data",
) -> dict[str, DataFrame]:
    """Materialize one pruned DataFrame per configured sink table.

    ``config_rows``: dicts with source_table, sink_table, sink_columns
    (comma-separated allowlist) — the TableProcess bean fields
    (reference: bean/TableProcess.java:10-31). Column pruning happens
    before any shuffle/write, mirroring MyBroadcastFunction.filterColumns.
    """
    out: dict[str, DataFrame] = {}
    for row in config_rows:
        cols = [c.strip() for c in row["sink_columns"].split(",") if c.strip()]
        routed = df.filter(F.col(route_key) == row["source_table"]).select(
            *[F.col(data_col)[c].alias(c) for c in cols]
        )
        out[row["sink_table"]] = routed
    return out


def split_by_predicates(
    df: DataFrame, predicates: Mapping[str, Column], cache: bool = True
) -> dict[str, DataFrame]:
    """N-way side-output split: one filtered view per named predicate.

    ``cache=True`` marks the parent for reuse so the N branches scan the
    parsed input once per action in batch mode (streaming fan-out instead
    uses one foreachBatch writing N sinks — streaming.sinks).
    """
    src = df.cache() if cache else df
    return {name: src.filter(pred) for name, pred in predicates.items()}
