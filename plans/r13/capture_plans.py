#!/usr/bin/env python
"""Capture .explain('formatted') for every bench headliner into
plans/r13/<name>_{before,after}.txt (judge deliverable for the
optimization round). Usage:

    python plans/r13/capture_plans.py before [name ...]
    python plans/r13/capture_plans.py after  [name ...]

Runs against $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].
Only the plan is captured (no execution) except for builders that execute
eagerly by design (streaming/stateful entries), whose final-frame plan is
what the file shows.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from realtime_gmall_flink_spark.plans.catalog import catalog  # noqa: E402
from realtime_gmall_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(app_name=f"plan-capture-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    names = [n for n, q in cat.items() if q.headline]
    # bench-only extra headliner (same builder the bench times)
    import bench

    extras = {n: q.builder for n, q in bench.EXTRA_HEADLINERS.items()}
    for name in sorted(set(names) | set(extras)):
        if only and name not in only:
            continue
        builder = extras.get(name) or cat[name].builder
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
