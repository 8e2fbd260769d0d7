"""Query catalog: the driver-checkable surface of the engine.

Each entry maps one or more SURVEY.md section-2 operator families onto the
driver's test tables (region nation customer supplier part orders lineitem
events documents embeddings) as a (Spark builder, DuckDB oracle SQL) pair.
The driver runs both at sf=0.01 and compares row count + schema +
order-insensitive value hash, so every aggregate/computed column is aliased
identically on both sides.

Determinism rules applied throughout (see plans/_parity.py):
- money/count sums go through DECIMAL so partial-aggregation order cannot
  produce last-ulp differences; final cast to double is exact;
- timestamps are TIMESTAMP_NTZ end-to-end (timezone-independent);
- interval comparisons use whole microseconds (timestampdiff MICROSECOND vs
  date_diff('microsecond', ...)), never truncated seconds;
- any top-k orders by (rounded measure desc, unique key) in both dialects.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QueryDef"] = {}
_LOADED = False

# Submodules that populate the registry on import.
_MODULES = (
    "realtime_gmall_flink_spark.plans.traffic",
    "realtime_gmall_flink_spark.plans.trade",
    "realtime_gmall_flink_spark.plans.textops",
    "realtime_gmall_flink_spark.plans.vectors",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    survey: str  # SURVEY.md section-2 operator ids this query exercises
    builder: Builder = field(repr=False)
    oracle: str | None = field(repr=False)  # DuckDB SQL; None -> rows-only
    headline: bool = False  # included in bench.py


def register(
    name: str, survey: str, oracle: str | None, headline: bool = False
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, survey, fn, oracle, headline)
        return fn

    return deco


def catalog() -> dict[str, QueryDef]:
    global _LOADED
    if not _LOADED:
        for mod in _MODULES:
            importlib.import_module(mod)
        _LOADED = True
    return dict(_REGISTRY)
