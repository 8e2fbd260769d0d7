"""CLI smoke: the warehouse command with --dws drives ODS->DWD->all-11
streaming DWS chains end-to-end over a file-drop corpus."""

from __future__ import annotations

import os

from realtime_gmall_flink_spark.__main__ import main
from realtime_gmall_flink_spark.streaming import dws_jobs

from . import gmall_fixtures as FX


def test_warehouse_cli_full_dws(spark, tmp_path):
    log_dir = tmp_path / "topic_log"
    db_dir = tmp_path / "topic_db"
    log_dir.mkdir()
    db_dir.mkdir()
    (log_dir / "d0.txt").write_text("\n".join(FX.topic_log_rows()) + "\n")
    (db_dir / "d0.txt").write_text("\n".join(FX.topic_db_rows()) + "\n")
    out = tmp_path / "wh"

    rc = main(
        [
            "warehouse",
            "--log-dir", str(log_dir),
            "--db-dir", str(db_dir),
            "--out", str(out),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--dws",
        ]
    )
    assert rc == 0

    dws_dir = out / "dws"
    for table in (
        *dws_jobs.DWS_TABLES,
        *dws_jobs.TRADE_DWS_TABLES,
        dws_jobs.ORDER_DWS_TABLE,
        dws_jobs.PROVINCE_DWS_TABLE,
        dws_jobs.TM_SPU_DWS_TABLE,
        dws_jobs.TM_REFUND_DWS_TABLE,
    ):
        path = dws_dir / table
        assert path.is_dir(), f"missing DWS table dir: {table}"
        # every table materialized with a real schema (rows may be held
        # back by pending dedup timers — that's the documented semantic)
        df = spark.read.parquet(str(path))
        assert df.columns, table
    # the order dedup detail (shared stage) exists and is readable
    assert os.path.isdir(out / "dwd_trade_order_detail_dedup")


def test_index_cli_lifecycle(spark, tmp_path, capsys):
    """index build -> drift -> refresh over the sq8 layout, plus the
    lsh unsupported-verb errors and the recover no-op — the CLI drives
    the same functions the library tests gate, so this is a smoke of
    wiring, not semantics."""
    import json

    src = str(tmp_path / "emb.parquet")
    from realtime_gmall_flink_spark.sources.testdata import load_table

    load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    ).write.parquet(src)
    idx = str(tmp_path / "sq8idx")

    assert main(["index", "build", "--kind", "sq8",
                 "--dir", idx, "--src", src]) == 0
    assert os.path.isdir(f"{idx}/codes")

    capsys.readouterr()
    assert main(["index", "drift", "--kind", "sq8", "--dir", idx]) == 0
    report = json.loads(capsys.readouterr().out.strip())
    assert report["growth"] == 0.0 and not report["rebuild_recommended"]

    assert main(["index", "refresh", "--kind", "sq8",
                 "--dir", idx, "--src", src]) == 0
    report = json.loads(capsys.readouterr().out.strip())
    assert report["rebuilt"] is False  # no drift -> no rebuild

    assert main(["index", "recover", "--kind", "sq8", "--dir", idx]) == 0

    # lsh refuses drift/refresh (parameter-free layout)
    assert main(["index", "drift", "--kind", "lsh", "--dir", idx]) == 2
    assert main(["index", "refresh", "--kind", "lsh", "--dir", idx]) == 2
    # sq8 build without --src is a usage error, not a crash
    import pytest as _pytest

    with _pytest.raises(SystemExit) as ei:
        main(["index", "build", "--kind", "sq8", "--dir", idx])
    assert ei.value.code == 2


def test_compact_cli_smoke(spark, tmp_path, capsys):
    """compact over a many-file plain dir rewrites it below threshold."""
    from pyspark.sql import functions as F

    d = tmp_path / "topic" / "t1"
    for i in range(12):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id")
        ).coalesce(1).write.mode("append").parquet(str(d))
    before = spark.read.parquet(str(d)).count()
    assert main(["compact", "--dir", str(tmp_path / "topic"),
                 "--max-files", "4"]) == 0
    out = capsys.readouterr().out
    assert "->" in out
    assert spark.read.parquet(str(d)).count() == before


def test_pipeline_cli_streaming_prints_resumable_checkpoint(
    spark, tmp_path, capsys
):
    """pipeline --streaming without --checkpoint must TELL the user
    where the generated checkpoint lives (it is the exactly-once
    resume token — a silent throwaway dir makes every rerun a full
    re-ingest), and passing that path back must resume the same
    checkpoint: the second run ingests only the new arrivals."""
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import _docs

    src = str(tmp_path / "drops")
    out = str(tmp_path / "pipe_out")
    docs = _docs(spark, "/root/testdata/sf0.001").select("doc_id", "text")
    docs.filter(F.col("doc_id") < 200).write.mode("append").parquet(src)

    assert main(["pipeline", "--streaming", "--src", src, "--out", out]) == 0
    err = capsys.readouterr().err
    m = re.search(r"--checkpoint (\S+)", err)
    assert m, err
    ckpt = m.group(1)
    assert os.path.isdir(ckpt)

    # resume on the printed path: only the new drop becomes batch=1
    docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
    ).write.mode("append").parquet(src)
    assert main(["pipeline", "--streaming", "--src", src, "--out", out,
                 "--checkpoint", ckpt]) == 0
    # an explicit checkpoint is not re-announced
    assert "--checkpoint " not in capsys.readouterr().err
    assert os.path.isdir(os.path.join(out, "scored_docs", "batch=1"))
    got = spark.read.parquet(os.path.join(out, "scored_docs")).drop(
        "batch"
    )
    assert got.select("doc_id").distinct().count() == 300


def test_shards_and_graph_cli_smoke(spark, tmp_path, capsys):
    """The r13 verbs: shards materializes the training layout and
    prints per-shard counts; graph build/staleness drive the persisted
    kNN graph lifecycle. Wiring smoke — semantics gated by the library
    tests."""
    import json

    from realtime_gmall_flink_spark.plans.vectors import ivfpq_build
    from realtime_gmall_flink_spark.sources.testdata import load_table

    docs_src = str(tmp_path / "docs.parquet")
    load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).write.parquet(docs_src)
    out = str(tmp_path / "shards")
    assert main(["shards", "--src", docs_src, "--out", out, "--n", "4"]) == 0
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if "shard=" in ln
    ]
    assert len(lines) == 4

    # doc_id-less source is a usage error, not a crash
    bad = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(bad)
    assert main(["shards", "--src", bad, "--out", out]) == 2

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    ivfpq = ivfpq_build(emb, str(tmp_path / "cli-ivfpq"))
    gdir = str(tmp_path / "cli-graph")
    assert main(["graph", "build", "--ivfpq", ivfpq, "--dir", gdir]) == 0
    assert "edges" in capsys.readouterr().out
    assert main(["graph", "staleness", "--ivfpq", ivfpq, "--dir", gdir]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["appended"] == 0 and not rep["rebuild_recommended"]


def test_shards_cli_rejects_nonpositive_n(spark, tmp_path, capsys):
    """--n 0 is a usage error (exit 2), never a silent fall-back to
    the default shard count."""
    from realtime_gmall_flink_spark.sources.testdata import load_table

    src = str(tmp_path / "docs.parquet")
    load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(10).write.parquet(src)
    assert (
        main(["shards", "--src", src, "--out",
              str(tmp_path / "o"), "--n", "0"]) == 2
    )
