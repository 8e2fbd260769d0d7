"""Incremental near-dup scoring against the persisted shingle index —
the text twin of the vector-ingest tests: hand-computable Jaccard on a
tiny fixture, exact-copy detection over the real corpus, idempotent
index appends that make earlier arrivals visible to later batches, and
streaming-vs-batch parity across a checkpointed restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.sources.testdata import load_table
from realtime_gmall_flink_spark.streaming import text_ingest as TI

from .conftest import SF_DIR


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_score_new_docs_hand_jaccard(spark, tmp_path):
    corpus = _docs_df(spark, [(1, "a b c d"), (2, "p q r s t")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    assert all(
        os.path.isdir(f"{idx}/{s}") for s in ("shingles", "sizes", "dfreq")
    )
    new = _docs_df(
        spark,
        [
            (10, "a b c d"),    # identical to doc 1 -> J = 1.0
            (11, "a b c x"),    # shares 1 of 3 shingles -> J = 1/3 < 0.5
            (12, "z z z z z"),  # disjoint
        ],
    )
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(spark, idx, new).collect()
    }
    assert got == {(10, 1): 1.0}


def test_exact_copy_detected_against_real_corpus(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = TI.shingle_index_build(docs, str(tmp_path / "idx"))
    copies = docs.filter(F.col("doc_id").isin(0, 1)).select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text"
    )
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(spark, idx, copies).collect()
    }
    assert got.get((700000, 0)) == 1.0
    assert got.get((700001, 1)) == 1.0


def test_append_is_idempotent_and_extends_scoring(spark, tmp_path):
    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    wave1 = _docs_df(spark, [(10, "m n o p q")])
    assert TI.append_docs_to_index(spark, idx, wave1) == 1
    assert TI.append_docs_to_index(spark, idx, wave1) == 0  # idempotent
    # a later arrival duplicating wave1 is now caught
    wave2 = _docs_df(spark, [(20, "m n o p q")])
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(spark, idx, wave2).collect()
    }
    assert got == {(20, 10): 1.0}


def test_streaming_ingest_matches_batch_with_restart(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = TI.shingle_index_build(docs, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def copies(ids, off):
        return docs.filter(F.col("doc_id").isin(ids)).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        )

    copies([0, 1, 2], 800000).write.mode("append").parquet(src)
    TI.run_doc_ingest(spark, src, idx, out, ckpt).awaitTermination()
    copies([3, 4], 800000).write.mode("append").parquet(src)
    TI.run_doc_ingest(spark, src, idx, out, ckpt).awaitTermination()

    def rowset(df):
        return sorted(
            (r["new_doc"], r["dup_of"], r["jaccard"]) for r in df.collect()
        )

    streamed = rowset(TI.read_near_dups(spark, out))
    batch = rowset(
        TI.score_new_docs(spark, idx, copies([0, 1, 2, 3, 4], 800000))
    )
    assert streamed == batch
    planted = {(s, d) for s, d, _ in streamed}
    assert {(800000 + i, i) for i in range(5)} <= planted


def test_append_crash_between_writes_heals(spark, tmp_path):
    """The crash window between the shingles append and the sizes
    append: simulate by folding a doc's shingles in WITHOUT its size
    row — the next append run must repair sizes from the persisted
    shingles (and not duplicate the shingles), and scoring must then
    see the doc with a correct Jaccard."""
    from realtime_gmall_flink_spark.plans.textops import shingle_hashes

    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    wave = _docs_df(spark, [(10, "m n o p q")])
    # crashed prior run: shingles committed, sizes not
    shingle_hashes(wave, "text", 3).write.mode("append").parquet(
        f"{idx}/shingles"
    )
    # retry: doc 10 must not re-append shingles (n == 0 fresh docs)
    assert TI.append_docs_to_index(spark, idx, wave) == 0
    sh_ct = (
        spark.read.parquet(f"{idx}/shingles")
        .filter(F.col("doc_id") == 10)
        .count()
    )
    assert sh_ct == 3  # 5 words -> 3 shingles, exactly once
    # ...but its size row was repaired
    sizes = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{idx}/sizes").collect()
    }
    assert sizes[10] == 3
    # and scoring a copy of it now works at exactly 1.0
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(
            spark, idx, _docs_df(spark, [(20, "m n o p q")])
        ).collect()
    }
    assert got == {(20, 10): 1.0}


def test_duplicate_rows_in_batch_do_not_corrupt_shingles(spark, tmp_path):
    """An at-least-once producer delivering the same (doc_id, text) row
    twice in one batch must not let the shingler's window pair tokens
    across the copies: the duplicate collapses and Jaccard stays
    exact."""
    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    dup_batch = _docs_df(spark, [(10, "a b c d"), (10, "a b c d")])
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(spark, idx, dup_batch).collect()
    }
    assert got == {(10, 1): 1.0}
    # append path collapses the duplicate too
    assert TI.append_docs_to_index(spark, idx, dup_batch) == 1
    assert (
        spark.read.parquet(f"{idx}/shingles")
        .filter(F.col("doc_id") == 10)
        .count()
        == 2  # 4 words -> 2 shingles, not 4+garbage
    )


def test_short_docs_get_audit_rows(spark, tmp_path):
    """Docs with fewer than k words produce zero shingles but must
    still appear in scored/batch=N (n_shingles = 0) — every arrival is
    recorded."""
    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    _docs_df(spark, [(10, "hi there"), (11, "a b c d")]).write.parquet(src)
    out = str(tmp_path / "out")
    TI.run_doc_ingest(
        spark, src, idx, out, str(tmp_path / "ckpt")
    ).awaitTermination()
    scored = {
        r["doc_id"]: r["n_shingles"]
        for r in spark.read.parquet(f"{out}/scored").collect()
    }
    assert scored == {10: 0, 11: 2}


def test_append_killpoint_fuzz(spark, tmp_path, monkeypatch):
    """Mechanical form of the crash-heal test: kill the append at each
    parquet-write call (shingles append, sizes repair), then retry —
    every kill-point must converge to the same index state as an
    uncrashed append (no duplicate shingles, correct sizes, correct
    scoring), the property the repair protocol claims for ALL its
    windows."""
    import pyspark.sql.readwriter as RW

    class Kill(Exception):
        pass

    real_parquet = RW.DataFrameWriter.parquet
    wave = [(10, "m n o p q"), (11, "x y z w v u")]

    for kill_at in (1, 2):
        corpus = _docs_df(spark, [(1, "a b c d")])
        idx = TI.shingle_index_build(
            corpus, str(tmp_path / f"idx{kill_at}")
        )
        calls = {"n": 0}

        def dying_parquet(self, path, **kw):
            calls["n"] += 1
            if calls["n"] >= kill_at:
                raise Kill()
            return real_parquet(self, path, **kw)

        monkeypatch.setattr(RW.DataFrameWriter, "parquet", dying_parquet)
        try:
            TI.append_docs_to_index(spark, idx, _docs_df(spark, wave))
            raise AssertionError(f"no kill fired at {kill_at}")
        except Kill:
            pass
        finally:
            monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)

        # heal: a plain retry must converge
        TI.append_docs_to_index(spark, idx, _docs_df(spark, wave))
        sh = (
            spark.read.parquet(f"{idx}/shingles")
            .groupBy("doc_id")
            .count()
            .collect()
        )
        assert {r["doc_id"]: r["count"] for r in sh} == {
            1: 2, 10: 3, 11: 4
        }
        sizes = {
            r["doc_id"]: r["n"]
            for r in spark.read.parquet(f"{idx}/sizes").collect()
        }
        assert sizes == {1: 2, 10: 3, 11: 4}
        got = {
            (r["new_doc"], r["dup_of"]): r["jaccard"]
            for r in TI.score_new_docs(
                spark, idx, _docs_df(spark, [(20, "m n o p q")])
            ).collect()
        }
        assert got == {(20, 10): 1.0}, (kill_at, got)


def test_shingle_index_rebuild_refreshes_dfreq(spark, tmp_path):
    """The frozen dfreq snapshot refreshes only via rebuild: a shingle
    appended past the viral cap keeps matching until
    shingle_index_rebuild recomputes df over the grown corpus — then
    the cap drops it (the drift-refresh loop for the text index)."""
    # corpus of 3 docs sharing shingle "a b c"; cap of... JACCARD_MAX_DF
    # is 64, too big to trip with a tiny fixture — use many docs sharing
    # one shingle plus unique tails
    n_viral = 70  # > JACCARD_MAX_DF = 64
    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    # append a flood of docs all containing the shingle "a b c"
    flood = _docs_df(
        spark,
        [(100 + i, f"a b c tail{i} x{i} y{i}") for i in range(n_viral)],
    )
    assert TI.append_docs_to_index(spark, idx, flood) == n_viral
    # before rebuild: dfreq still says df("a b c") == 1, so a new doc
    # sharing only that shingle still matches doc 1
    probe = _docs_df(spark, [(999, "a b c")])  # exactly one shingle
    got = {
        (r["new_doc"], r["dup_of"])
        for r in TI.score_new_docs(
            spark, idx, probe, threshold=0.2
        ).collect()
    }
    assert (999, 1) in got
    # rebuild over the grown corpus: df("a b c") == 71 > 64 -> viral,
    # the probe's only shingle is dropped, no pair survives
    grown = corpus.unionByName(flood)
    TI.shingle_index_rebuild(grown, idx)
    got2 = TI.score_new_docs(spark, idx, probe, threshold=0.2).collect()
    assert got2 == []
    # and the rebuilt index still scores ordinary near-dups, with the
    # now-viral "a b c" shingle excluded from the intersection (3 of 4
    # shingles shared, sizes still 4 -> J = 3/(4+4-3) = 0.6) — exactly
    # the boilerplate-excluding stop-shingle semantics of the batch
    # pair generator
    copy = _docs_df(spark, [(998, "a b c tail0 x0 y0")])
    got3 = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(spark, idx, copy).collect()
    }
    assert got3[(998, 100)] == 0.6


def test_shingle_index_drift_counts_appended_docs(spark, tmp_path):
    """Fresh index: zero growth. After appending docs with novel
    shingles, the drift report counts them and recommends a rebuild
    past the threshold; a rebuild resets the baseline."""
    corpus = _docs_df(spark, [(i, f"base{i} mid{i} end{i} tail{i}")
                              for i in range(4)])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    d0 = TI.shingle_index_drift(spark, idx)
    assert d0 == {
        "total_build": 4,
        "total_now": 4,
        "appended_docs": 0,
        "growth": 0.0,
        "rebuild_recommended": False,
        "max_unit_files": 1,
        "compaction_recommended": False,
    }
    wave = _docs_df(spark, [(100 + i, f"new{i} words{i} here{i} too{i}")
                            for i in range(3)])
    TI.append_docs_to_index(spark, idx, wave)
    d1 = TI.shingle_index_drift(spark, idx)
    assert d1["appended_docs"] == 3
    assert d1["total_build"] == 4 and d1["total_now"] == 7
    assert d1["rebuild_recommended"]  # 3/4 > 0.5
    grown = corpus.unionByName(wave)
    TI.shingle_index_rebuild(grown, idx)
    d2 = TI.shingle_index_drift(spark, idx)
    assert d2["total_build"] == 7
    assert d2["appended_docs"] == 0
    assert not d2["rebuild_recommended"]


def test_append_part_files_hold_whole_docs(spark, tmp_path):
    """The append crash-window invariant: every data file the shingle
    append commits contains ALL of a doc's shingle rows (the batch is
    repartitioned by doc_id before the write), so a crash mid-job-commit
    — which persists a subset of FILES — can only persist whole docs,
    never an undercounted shingle set that the doc-presence dedup would
    then trust forever."""
    import glob
    import os

    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    # docs with distinct sizes, enough of them to spread over several
    # shuffle partitions / output files
    wave = _docs_df(
        spark,
        [(100 + i, " ".join(f"w{i}x{j}" for j in range(3 + i % 7)))
         for i in range(24)],
    )
    assert TI.append_docs_to_index(spark, idx, wave) == 24
    full = {
        r["doc_id"]: r["count"]
        for r in spark.read.parquet(f"{idx}/shingles")
        .groupBy("doc_id")
        .count()
        .collect()
    }
    data_files = [
        f
        for f in glob.glob(f"{idx}/shingles/*.parquet")
        if not os.path.basename(f).startswith("_")
    ]
    assert len(data_files) > 1  # the invariant is vacuous on one file
    seen_docs = 0
    for f in data_files:
        per_file = {
            r["doc_id"]: r["count"]
            for r in spark.read.parquet(f)
            .groupBy("doc_id")
            .count()
            .collect()
        }
        for doc_id, n in per_file.items():
            assert n == full[doc_id], (f, doc_id)
        seen_docs += len(per_file)
    assert seen_docs == len(full)  # no doc spans two files


def test_shingle_drift_fast_path_and_legacy_fallback(spark, tmp_path):
    """A current-layout index carries build_stats, so drift is a scalar
    compare; a pre-build_stats index (simulated by deleting the
    subdir) falls back to the anti-join recovery — both must report the
    same numbers."""
    import shutil

    corpus = _docs_df(spark, [(i, f"base{i} mid{i} end{i} tail{i}")
                              for i in range(4)])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    wave = _docs_df(spark, [(100 + i, f"new{i} words{i} here{i} too{i}")
                            for i in range(3)])
    TI.append_docs_to_index(spark, idx, wave)
    fast = TI.shingle_index_drift(spark, idx)
    shutil.rmtree(f"{idx}/build_stats")
    legacy = TI.shingle_index_drift(spark, idx)
    assert fast == legacy
    assert fast["total_build"] == 4 and fast["appended_docs"] == 3


def test_legacy_index_migrated_not_destroyed(spark, tmp_path):
    """An index from before the build_stats layout, grown via appends,
    passed back to shingle_index_build: the layout must be MIGRATED in
    place (build_stats backfilled with the recovered BUILD-time count,
    not the current count), never treated as debris — a rebuild from
    the caller's corpus would silently drop every appended doc."""
    import shutil

    corpus = _docs_df(spark, [(i, f"base{i} mid{i} end{i} tail{i}")
                              for i in range(4)])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    wave = _docs_df(spark, [(100 + i, f"new{i} words{i} here{i} too{i}")
                            for i in range(3)])
    TI.append_docs_to_index(spark, idx, wave)
    shutil.rmtree(f"{idx}/build_stats")  # simulate the legacy layout

    # re-entering build with only the ORIGINAL corpus must keep the
    # appended docs and backfill the build-time baseline
    assert TI.shingle_index_build(corpus, idx) == idx
    sizes = {
        r["doc_id"] for r in spark.read.parquet(f"{idx}/sizes").collect()
    }
    assert {100, 101, 102} <= sizes  # appended docs survived
    d = TI.shingle_index_drift(spark, idx)
    assert d["total_build"] == 4 and d["appended_docs"] == 3
    # and the appended docs still score
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in TI.score_new_docs(
            spark, idx, _docs_df(spark, [(200, "new0 words0 here0 too0")])
        ).collect()
    }
    assert got == {(200, 100): 1.0}


def test_whole_doc_files_survive_max_records_per_file(spark, tmp_path):
    """A session-level spark.sql.files.maxRecordsPerFile would split a
    task's rows across files at arbitrary record boundaries; the append
    pins the writer option to 0 so the whole-doc-per-file invariant
    holds regardless of session config."""
    import glob
    import os

    corpus = _docs_df(spark, [(1, "a b c d")])
    idx = TI.shingle_index_build(corpus, str(tmp_path / "idx"))
    wave = _docs_df(
        spark,
        [(100 + i, " ".join(f"w{i}x{j}" for j in range(8)))
         for i in range(6)],
    )
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
    try:
        assert TI.append_docs_to_index(spark, idx, wave) == 6
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    full = {
        r["doc_id"]: r["count"]
        for r in spark.read.parquet(f"{idx}/shingles")
        .groupBy("doc_id")
        .count()
        .collect()
    }
    for f in glob.glob(f"{idx}/shingles/*.parquet"):
        if os.path.basename(f).startswith("_"):
            continue
        per_file = {
            r["doc_id"]: r["count"]
            for r in spark.read.parquet(f).groupBy("doc_id").count().collect()
        }
        for doc_id, n in per_file.items():
            assert n == full[doc_id], (f, doc_id)


def test_gram_index_copied_span_scoring(spark, tmp_path):
    """Corpus with a known passage; a new doc embedding a 12-word copy
    of it must score dup positions exactly where the copy's 8-grams
    lie (12-8+1 = 5 consecutive -> span 12 tokens); a fresh doc scores
    zero; appending the new docs extends the index idempotently."""
    passage = " ".join(f"p{i}" for i in range(12))
    corpus = _docs_df(
        spark,
        [(1, f"intro {passage} outro"),
         (2, " ".join(f"c{i}" for i in range(10)))],
    )
    idx = TI.gram_index_build(corpus, str(tmp_path / "grams"))
    new = _docs_df(
        spark,
        [(10, f"n1 n2 {passage} n3"),
         (11, " ".join(f"z{i}" for i in range(15)))],
    )
    got = {
        r["new_doc"]: (r["n_pos"], r["dup_pos"], r["max_run"])
        for r in TI.score_new_docs_spans(spark, idx, new).collect()
    }
    # doc 10: 15 words -> 8 positions; the copy occupies words 3..14
    # (1-based) -> dup positions 3..7 = 5 consecutive
    assert got[10] == (8, 5, 5)
    assert 5 + 8 - 1 == 12  # span length == the copied passage
    # doc 11: 15 unique words -> 8 positions, none copied
    assert got[11] == (8, 0, 0)

    # append folds the new docs' grams in; a replay appends nothing
    n1 = TI.gram_index_append(spark, idx, new)
    assert n1 > 0
    assert TI.gram_index_append(spark, idx, new) == 0
    # an exact copy of doc 11 now scores as fully copied
    copy = _docs_df(spark, [(20, " ".join(f"z{i}" for i in range(15)))])
    got2 = {
        r["new_doc"]: (r["dup_pos"], r["max_run"])
        for r in TI.score_new_docs_spans(spark, idx, copy).collect()
    }
    assert got2[20] == (8, 8)


def test_streaming_copied_spans_match_batch_with_restart(spark, tmp_path):
    """Span scoring on arrival: the streaming copied_spans side output
    must equal the batch scorer over all arrivals, across a
    checkpointed restart, with a planted corpus passage detected."""
    passage = " ".join(f"p{i}" for i in range(12))
    corpus = _docs_df(
        spark, [(1, f"intro {passage} outro"), (2, "a b c d e f g h i")]
    )
    sh_idx = TI.shingle_index_build(corpus, str(tmp_path / "sh"))
    gram_idx = TI.gram_index_build(corpus, str(tmp_path / "grams"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    wave1 = [(10, f"n1 n2 {passage} n3"), (11, "q r s t u v w x y")]
    wave2 = [(12, f"{passage} tail1 tail2")]
    _docs_df(spark, wave1).write.mode("append").parquet(src)
    TI.run_doc_ingest(
        spark, src, sh_idx, out, ckpt, gram_index_dir=gram_idx
    ).awaitTermination()
    _docs_df(spark, wave2).write.mode("append").parquet(src)
    TI.run_doc_ingest(
        spark, src, sh_idx, out, ckpt, gram_index_dir=gram_idx
    ).awaitTermination()

    got = {
        r["new_doc"]: (r["n_pos"], r["dup_pos"], r["max_run"])
        for r in TI.read_copied_spans(spark, out).collect()
    }
    want = {
        r["new_doc"]: (r["n_pos"], r["dup_pos"], r["max_run"])
        for r in TI.score_new_docs_spans(
            spark, gram_idx, _docs_df(spark, wave1 + wave2)
        ).collect()
    }
    assert got == want
    # restart processed wave2 exactly once; planted copies detected
    assert len(got) == 3
    assert got[10][1:] == (5, 5)   # 12-word copy -> 5-position run
    assert got[12][1:] == (5, 5)
    assert got[11][1] == 0


def test_gram_index_k_is_persisted_and_validated(spark, tmp_path):
    """The gram width is a build-time property: probes and appends
    resolve it FROM the index, and an explicitly mismatched k raises
    instead of silently scoring everything zero (probe) or poisoning
    the hash set (append). A pre-meta index migrates in place."""
    import shutil

    import pytest as _pytest

    corpus = _docs_df(spark, [(1, " ".join(f"c{i}" for i in range(10)))])
    idx = TI.gram_index_build(corpus, str(tmp_path / "g4"), k=4)
    copy = _docs_df(spark, [(10, " ".join(f"c{i}" for i in range(10)))])
    # probe with no k: resolves k=4 from meta and detects the copy
    got = TI.score_new_docs_spans(spark, idx, copy).collect()[0]
    assert got["dup_pos"] == 7 and got["max_run"] == 7  # 10-4+1
    # mismatched explicit k raises on probe, append, and re-build
    with _pytest.raises(ValueError, match="built with k=4"):
        TI.score_new_docs_spans(spark, idx, copy, k=8)
    with _pytest.raises(ValueError, match="built with k=4"):
        TI.gram_index_append(spark, idx, copy, k=8)
    with _pytest.raises(ValueError, match="built with k=4"):
        TI.gram_index_build(corpus, idx, k=8)
    # legacy (pre-meta) index: migrated in place as k=8, not rebuilt
    idx8 = TI.gram_index_build(corpus, str(tmp_path / "g8"))
    TI.gram_index_append(spark, idx8, copy)
    n_before = spark.read.parquet(f"{idx8}/grams").count()
    shutil.rmtree(f"{idx8}/meta")
    assert TI.gram_index_build(corpus, idx8) == idx8
    assert spark.read.parquet(f"{idx8}/grams").count() == n_before
    # a pre-meta layout that was REALLY built at k=4: a k=4 caller must
    # not be told "built with k=8" after a silent default stamp — the
    # migration refuses to stamp and names the remedy (ADVICE r8)
    from realtime_gmall_flink_spark.indexutil import read_index_meta

    shutil.rmtree(f"{idx}/meta")
    with _pytest.raises(ValueError, match="predates meta"):
        TI.gram_index_build(corpus, idx, k=4)
    assert read_index_meta(idx) is None  # not mislabeled as k=8
    # probe/append paths word the pre-meta fallback as an ASSUMPTION
    # too — never "was built with k=8" for a value nobody recorded
    with _pytest.raises(ValueError, match="assumed 8"):
        TI.score_new_docs_spans(spark, idx, copy, k=4)


def test_shingle_index_fragmentation_cue_and_compaction(spark, tmp_path):
    """The text indexes carry the same fragmentation cue as the vector
    families: per-hash-idempotent appends fragment the flat shingles/
    sizes trees, shingle_index_drift reports it with compaction (not
    rebuild) as the remedy, and shingle_index_compact clears it while
    preserving scoring results exactly."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = TI.shingle_index_build(docs, str(tmp_path / "idx"))

    def copies(ids, off):
        return docs.filter(F.col("doc_id").isin(ids)).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        )

    for i in range(5):
        TI.append_docs_to_index(spark, idx, copies([i], 800000))
    drift = TI.shingle_index_drift(spark, idx, frag_warn=3)
    assert drift["compaction_recommended"] is True
    assert drift["rebuild_recommended"] is False  # tiny growth
    before = sorted(
        (r["new_doc"], r["dup_of"], r["jaccard"])
        for r in TI.score_new_docs(
            spark, idx, copies([0, 1], 900000)
        ).collect()
    )
    rep = TI.shingle_index_compact(spark, idx, max_files=3)
    assert rep["units_compacted"] >= 1
    after_drift = TI.shingle_index_drift(spark, idx, frag_warn=3)
    assert after_drift["compaction_recommended"] is False
    after = sorted(
        (r["new_doc"], r["dup_of"], r["jaccard"])
        for r in TI.score_new_docs(
            spark, idx, copies([0, 1], 900000)
        ).collect()
    )
    assert after == before
