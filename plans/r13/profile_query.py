#!/usr/bin/env python
"""Profile one (or more) bench headliners: run builder().count() like
bench.py does, with the Spark event log on, then summarize per-job and
per-stage wall time for the WARM pass. Usage:

    python plans/r13/profile_query.py ann_ivfpq_topk [more names...]

Prints, per query: cold/warm wall seconds, then the warm pass's jobs
(job id, duration ms, description) and the slowest stages.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from realtime_gmall_flink_spark.plans.catalog import catalog  # noqa: E402
from realtime_gmall_flink_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def parse_events(path: str, t_lo: float, t_hi: float) -> None:
    """Summarize jobs/stages whose submission falls in [t_lo, t_hi] ms."""
    jobs = {}
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub and com:
                    stages[sid] = {
                        "ms": com - sub,
                        "name": si.get("Stage Name", "")[:80],
                        "tasks": si.get("Number of Tasks"),
                    }
    sel = {
        j: v
        for j, v in jobs.items()
        if "end" in v and t_lo <= v["start"] <= t_hi
    }
    total = sum(v["end"] - v["start"] for v in sel.values())
    print(f"  warm pass: {len(sel)} jobs, sum job wall {total} ms")
    prev_end = t_lo
    for j, v in sorted(sel.items()):
        dur = v["end"] - v["start"]
        gap = v["start"] - prev_end
        prev_end = v["end"]
        print(f"    job {j}: {dur:6d} ms (gap {gap:5.0f} ms)  {v['desc']}")
        for sid in v["stages"]:
            if sid in stages:
                s = stages[sid]
                print(
                    f"       stage {sid}: {s['ms']:6d} ms "
                    f"({s['tasks']} tasks) {s['name']}"
                )


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="profile-query",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    cat = catalog()
    import bench

    extras = {n: q.builder for n, q in bench.EXTRA_HEADLINERS.items()}
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
    results = {}
    for name in names:
        builder = extras.get(name) or cat[name].builder
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t0 = time.perf_counter()
        builder(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"{name}: settle")
        builder(spark, sf_dir).count()
        spark.sparkContext.setJobDescription(f"{name}: warm")
        t_lo = time.time() * 1000
        t0 = time.perf_counter()
        builder(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        t_hi = time.time() * 1000
        results[name] = (cold, warm, t_lo, t_hi)
    spark.stop()
    import glob

    log = os.path.join(EVDIR, app_id)
    if os.path.isdir(os.path.join(EVDIR, f"eventlog_v2_{app_id}")):
        cands = glob.glob(
            os.path.join(EVDIR, f"eventlog_v2_{app_id}", "events_*")
        )
        log = sorted(cands)[0] if cands else log
    for name, (cold, warm, t_lo, t_hi) in results.items():
        print(f"\n=== {name}: cold {cold:.3f}s warm {warm:.3f}s ===")
        parse_events(log, t_lo - 50, t_hi + 50)


if __name__ == "__main__":
    main()
