"""Shared plan-shape assertion helpers for the pruned-index tests.

The explain format has already changed once across Spark versions (IN
vs INSET rendering for literal partition filters); keeping ONE
definition of the capture means a future format change is fixed here,
not in four copies that can silently go vacuous one at a time.
"""

from __future__ import annotations

import re

# greedy number-list capture: a lazy form would stop at the first comma
# and make cell-count assertions vacuous for INSET
_PRUNE_RE = (
    r"PartitionFilters: \[cid#\d+ "
    r"(?:IN \(([0-9]+(?:, ?[0-9]+)*)\)|INSET ([0-9]+(?:, ?[0-9]+)*))"
)


def formatted_plan(df) -> str:
    """The formatted explain string (toString truncates long FileScan
    lines; formatted mode prints PartitionFilters complete)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def pruned_cids(plan: str) -> list[str]:
    """The literal cid list of the plan's partition-pruned scan; fails
    the calling test if no literal cid PartitionFilter exists."""
    m = re.search(_PRUNE_RE, plan)
    assert m, plan
    return [c.strip() for c in (m.group(1) or m.group(2)).split(",")]


def assert_codes_scans_no_embedding(plan: str) -> None:
    """Every scan of a codes layout in ``plan`` must read a
    no-embedding ReadSchema (vec_id + tinyint ranks only) — the
    codes-only IO contract of the PQ-family probes."""
    chunks = [c for c in plan.split("Scan parquet") if "/codes" in c]
    assert chunks, plan
    for c in chunks:
        rs = re.search(r"ReadSchema: (\S+)", c)
        assert rs and "embedding" not in rs.group(1), c
