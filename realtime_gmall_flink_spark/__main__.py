"""CLI: run catalog queries, inspect plans, launch the streaming
warehouse against file-drop directories, or maintain persisted
artifacts (indexes, topic dirs).

    python -m realtime_gmall_flink_spark list
    python -m realtime_gmall_flink_spark run <query> [--sf-dir DIR] [--limit N]
    python -m realtime_gmall_flink_spark explain <query> [--sf-dir DIR]
    python -m realtime_gmall_flink_spark bench [--sf-dir DIR]
    python -m realtime_gmall_flink_spark warehouse --log-dir D --db-dir D --out D
    python -m realtime_gmall_flink_spark index <build|drift|refresh|recover>
        --kind <ivf|lsh|sq8|shingle> --dir D [--src PARQUET]
    python -m realtime_gmall_flink_spark pipeline [--sf-dir DIR]
        [--streaming --src DROPDIR --out D [--checkpoint D]]
    python -m realtime_gmall_flink_spark compact --dir D [--max-files N]
    python -m realtime_gmall_flink_spark shards --src PARQUET --out D [--n N]
    python -m realtime_gmall_flink_spark graph <build|staleness>
        --ivfpq D --dir G
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="realtime_gmall_flink_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser("bench")
    sp.add_argument("--sf-dir", default=None)

    sp = sub.add_parser(
        "index", help="maintain a persisted index (ivf/lsh/sq8/shingle)"
    )
    sp.add_argument(
        "action", choices=("build", "drift", "refresh", "recover")
    )
    sp.add_argument(
        "--kind", required=True, choices=("ivf", "lsh", "sq8", "shingle")
    )
    sp.add_argument("--dir", required=True, dest="index_dir")
    sp.add_argument(
        "--src",
        default=None,
        help="source parquet (embeddings for ivf/lsh/sq8, documents for"
        " shingle); required for build, and for sq8/shingle refresh"
        " (their layouts cannot self-source a corpus)",
    )

    sp = sub.add_parser(
        "compact", help="compact small files under a topic/table dir"
    )
    sp.add_argument("--dir", required=True, dest="topic_dir")
    sp.add_argument("--max-files", type=int, default=8)

    sp = sub.add_parser(
        "pipeline",
        help="end-to-end curation pipeline: lang -> quality -> dedup ->"
        " decontaminate -> pack, batch (--sf-dir) or streaming ingest +"
        " finalize (--streaming --src --out)",
    )
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument(
        "--streaming",
        action="store_true",
        help="score (doc_id, text) parquet drops from --src on arrival,"
        " then finalize the corpus-level stages over --out",
    )
    sp.add_argument("--src", default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--checkpoint", default=None)

    sp = sub.add_parser(
        "shards",
        help="materialize training shards (deterministic in-shard"
        " training order) from a documents parquet",
    )
    sp.add_argument(
        "--src", required=True, help="documents parquet (needs doc_id)"
    )
    sp.add_argument("--out", required=True)
    sp.add_argument("--n", type=int, default=None, dest="n_shards")

    sp = sub.add_parser(
        "graph",
        help="persisted kNN graph over an IVF-PQ layout"
        " (build-once/read-many; staleness = the rebuild cue)",
    )
    sp.add_argument("action", choices=("build", "staleness"))
    sp.add_argument("--ivfpq", required=True, dest="ivfpq_dir")
    sp.add_argument("--dir", required=True, dest="graph_dir")

    sp = sub.add_parser("warehouse", help="streaming ODS->DWD over file drops")
    sp.add_argument("--log-dir", required=True)
    sp.add_argument("--db-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument(
        "--dws",
        action="store_true",
        help="also run the streaming DWS stage (log-side chained queries)",
    )

    args = p.parse_args(argv)

    if args.cmd == "bench":
        import os

        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        import bench  # repo-root harness

        bench.main()
        return 0

    from .plans.catalog import catalog

    if args.cmd == "list":
        for q in sorted(catalog().values(), key=lambda q: q.name):
            marks = ("headline" if q.headline else "") + (
                "" if q.oracle else " rows-only"
            )
            print(f"{q.name:36s} [{q.survey}] {marks}")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"gmall-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "index":
        return _index_cmd(spark, args)

    if args.cmd == "compact":
        from .streaming.compaction import compact_dir

        stats = compact_dir(spark, args.topic_dir, args.max_files)
        if not stats:
            print("nothing to compact (all dirs within threshold)")
        for d, (before, after) in sorted(stats.items()):
            print(f"{d}: {before} -> {after} files")
        return 0

    if args.cmd in ("run", "explain"):
        cat = catalog()
        if args.query not in cat:
            print(f"unknown query: {args.query}", file=sys.stderr)
            print("use `list` to see available queries", file=sys.stderr)
            return 2
        df = cat[args.query].builder(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "shards":
        from .plans.textops import (
            N_TRAINING_SHARDS,
            write_training_shards,
        )

        docs = spark.read.parquet(args.src)
        if "doc_id" not in docs.columns:
            print(
                f"--src {args.src!r} has no doc_id column — the shard"
                " id and training order hash it",
                file=sys.stderr,
            )
            return 2
        n = (
            args.n_shards
            if args.n_shards is not None
            else N_TRAINING_SHARDS
        )
        if n < 1:
            print(f"--n must be >= 1 (got {n})", file=sys.stderr)
            return 2
        write_training_shards(docs, args.out, n)
        for r in (
            spark.read.parquet(args.out)
            .groupBy("shard")
            .count()
            .orderBy("shard")
            .collect()
        ):
            print(f"shard={r['shard']}: {r['count']} docs")
        return 0

    if args.cmd == "graph":
        import json as _json

        from .plans.vectors import (
            knn_graph_build,
            knn_graph_staleness,
            read_knn_graph,
        )

        if args.action == "build":
            knn_graph_build(spark, args.ivfpq_dir, args.graph_dir)
            n = read_knn_graph(spark, args.graph_dir).count()
            print(f"graph at {args.graph_dir}: {n} edges")
        else:
            print(
                _json.dumps(
                    knn_graph_staleness(
                        spark, args.ivfpq_dir, args.graph_dir
                    )
                )
            )
        return 0

    if args.cmd == "pipeline":
        if args.streaming:
            import tempfile

            from .streaming import curation

            if not (args.src and args.out):
                print(
                    "--src and --out are required with --streaming",
                    file=sys.stderr,
                )
                return 2
            import glob
            import os as _os

            if not _os.path.isdir(args.src) or not (
                glob.glob(f"{args.src}/*.parquet")
                or glob.glob(f"{args.src}/**/*.parquet", recursive=True)
            ):
                print(
                    f"--src {args.src!r} is not a directory containing"
                    " parquet files",
                    file=sys.stderr,
                )
                return 2
            ckpt = args.checkpoint or tempfile.mkdtemp(
                prefix="gmall-pipeline-ckpt-"
            )
            if not args.checkpoint:
                # the checkpoint is the exactly-once resume token: a
                # silent throwaway dir would make the NEXT invocation
                # re-ingest everything — tell the user how to resume
                print(
                    f"checkpoint: {ckpt}  (pass --checkpoint {ckpt} to"
                    " resume this ingest exactly-once)",
                    file=sys.stderr,
                )
            curation.run_curation_ingest(
                spark, args.src, args.out, ckpt
            ).awaitTermination()
            df = curation.finalize_curation(spark, args.out)
        else:
            df = catalog()["curation_pipeline_counts"].builder(
                spark, args.sf_dir
            )
        df.show(truncate=False)
        return 0

    if args.cmd == "warehouse":
        import tempfile

        from .schemas import BASE_DIC_SCHEMA
        from .streaming import warehouse

        ckpt = args.checkpoint or tempfile.mkdtemp(prefix="gmall-ckpt-")
        if not args.checkpoint:
            print(
                f"checkpoint: {ckpt}  (pass --checkpoint {ckpt} to"
                " resume exactly-once)",
                file=sys.stderr,
            )
        base_dic = spark.createDataFrame([], BASE_DIC_SCHEMA)
        q1 = warehouse.run_log_side(
            spark, args.log_dir, args.out, f"{ckpt}/log"
        )
        q2 = warehouse.run_db_side(
            spark, args.db_dir, base_dic, args.out, f"{ckpt}/db"
        )
        q1.awaitTermination()
        q2.awaitTermination()
        if args.dws:
            from .gmall import cdc, dims as dims_mod
            from .streaming import dws_jobs

            dws_jobs.run_traffic_user_dws(
                spark, args.out, f"{args.out}/dws", f"{ckpt}/dws"
            )
            dws_jobs.run_trade_user_dws(
                spark, args.out, f"{args.out}/dws", f"{ckpt}/dws_trade"
            )
            # changelog chains: order window, then the three windows that
            # share its dedup detail
            dws_jobs.run_trade_order_dws(
                spark, args.out, f"{args.out}/dws", f"{ckpt}/dws_order"
            )
            import os as _os

            raw_db = spark.read.text(args.db_dir)
            dims = dims_mod.build_dims(cdc.parse_topic_db(raw_db))
            if _os.path.isdir(
                f"{args.out}/dwd_trade_order_detail_dedup"
            ):
                dws_jobs.run_trade_province_dws(
                    spark,
                    args.out,
                    f"{args.out}/dws",
                    f"{ckpt}/dws_prov",
                    dims["dim_base_province"],
                )
                dws_jobs.run_trade_tm_spu_dws(
                    spark, args.out, f"{args.out}/dws",
                    f"{ckpt}/dws_tm_spu", dims,
                )
            if _os.path.isdir(f"{args.out}/dwd_trade_order_refund"):
                dws_jobs.run_trade_tm_refund_dws(
                    spark, args.out, f"{args.out}/dws",
                    f"{ckpt}/dws_tm_refund", dims,
                )
        print(f"warehouse written to {args.out}")
        return 0

    return 1


def _index_cmd(spark, args) -> int:
    """Dispatch the index maintenance verbs over the four persisted
    layouts. The asymmetries are deliberate and mirror each layout's
    contract: lsh is parameter-free (no drift baseline, no refresh);
    ivf refresh self-sources its corpus from the assignment; sq8 and
    shingle refresh REQUIRE --src (lossy codes / frozen dfreq cannot
    reconstruct a corpus)."""
    import json
    import sys as _sys

    from .indexutil import recover_index
    from .plans.vectors import (
        IVF_SUBDIRS,
        LSH_SUBDIRS,
        SQ8_SUBDIRS,
        ivf_build,
        ivf_drift,
        ivf_refresh_if_drifted,
        lsh_build,
        sq8_build,
        sq8_drift,
        sq8_refresh_if_drifted,
    )
    from .streaming.text_ingest import (
        SHINGLE_SUBDIRS,
        shingle_index_build,
        shingle_index_drift,
        shingle_index_rebuild,
    )

    kind, action, idx = args.kind, args.action, args.index_dir
    subdirs = {
        "ivf": IVF_SUBDIRS,
        "lsh": LSH_SUBDIRS,
        "sq8": SQ8_SUBDIRS,
        "shingle": SHINGLE_SUBDIRS,
    }[kind]

    def need_src() -> "DataFrame":
        if not args.src:
            print(
                f"--src is required for {kind} {action}", file=_sys.stderr
            )
            raise SystemExit(2)
        return spark.read.parquet(args.src)

    if action == "recover":
        rolled = recover_index(idx, subdirs)
        print(f"recover: {'rolled' if rolled else 'nothing to do'}")
        return 0

    if action == "build":
        src = need_src()
        build = {
            "ivf": ivf_build,
            "lsh": lsh_build,
            "sq8": sq8_build,
            "shingle": shingle_index_build,
        }[kind]
        print(build(src, idx))
        return 0

    if action == "drift":
        if kind == "lsh":
            print(
                "lsh is parameter-free (no drift baseline)",
                file=_sys.stderr,
            )
            return 2
        drift = {
            "ivf": ivf_drift,
            "sq8": sq8_drift,
            "shingle": shingle_index_drift,
        }[kind]
        print(json.dumps(drift(spark, idx)))
        return 0

    # refresh
    if kind == "lsh":
        print(
            "lsh has no drift baseline (its only parameter, the bucket"
            " width in meta/, requires a rebuild to change)",
            file=_sys.stderr,
        )
        return 2
    if kind == "ivf":
        report = ivf_refresh_if_drifted(
            spark, idx, spark.read.parquet(args.src) if args.src else None
        )
    elif kind == "sq8":
        report = sq8_refresh_if_drifted(spark, idx, need_src())
    else:  # shingle — validate --src EAGERLY (like sq8's need_src):
        # failing only when drift finally crosses the threshold would
        # discard the computed report and silently skip the rebuild
        src = need_src()
        report = dict(shingle_index_drift(spark, idx))
        report["rebuilt"] = False
        report["compacted"] = False
        if report["rebuild_recommended"]:
            shingle_index_rebuild(src, idx)
            report["rebuilt"] = True
        elif report["compaction_recommended"]:
            # same routing as the vector-family refresh entry points:
            # fragmentation gets a rewrite, never a dfreq retrain
            from .streaming.text_ingest import shingle_index_compact

            shingle_index_compact(spark, idx)
            report["compacted"] = True
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
