"""Edge-case tests for the operator primitives (beyond catalog parity)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.functions.sketches import word_shingles
from realtime_gmall_flink_spark.functions.similarity import cosine_similarity
from realtime_gmall_flink_spark.functions.textstats import predict_language
from realtime_gmall_flink_spark.operators.dedup import latest_row_per_key
from realtime_gmall_flink_spark.operators.jumpout import jump_out_batch
from realtime_gmall_flink_spark.operators.visitor import (
    first_per_period,
    gap_flag,
)
from realtime_gmall_flink_spark.operators.windows import tumble_agg


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_dedup_tie_broken_by_second_key(spark):
    df = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), 1, "a"),
         ("k", _ts("2024-01-01 00:00:00"), 2, "b")],
        "k string, ts timestamp_ntz, seq int, payload string",
    )
    out = latest_row_per_key(df, ["k"], ["ts", "seq"]).collect()
    assert len(out) == 1 and out[0]["payload"] == "b"


def test_dedup_empty_input(spark):
    df = spark.createDataFrame([], "k string, ts timestamp_ntz, seq int")
    assert latest_row_per_key(df, ["k"], ["ts", "seq"]).count() == 0


def test_gap_flag_boundary_exactly_n_days(spark):
    df = spark.createDataFrame(
        [("u", _ts("2024-01-01 12:00:00")),
         ("u", _ts("2024-01-09 00:00:00")),   # calendar gap = 8 -> back
         ("v", _ts("2024-01-01 12:00:00")),
         ("v", _ts("2024-01-08 23:59:59"))],  # calendar gap = 7 -> not back
        "uid string, ts timestamp_ntz",
    )
    out = {
        (r["uid"], r["ts"]): r["is_back"]
        for r in gap_flag(df, "uid", "ts", min_gap_days=8).collect()
    }
    assert out[("u", _ts("2024-01-09 00:00:00"))] == 1
    assert out[("v", _ts("2024-01-08 23:59:59"))] == 0
    # first-ever rows are never back-flow
    assert out[("u", _ts("2024-01-01 12:00:00"))] == 0


def test_jump_out_boundary_exactly_timeout(spark):
    # next event at exactly timeout -> within window -> not a jump-out
    df = spark.createDataFrame(
        [("m", _ts("2024-01-01 00:00:00"), True),
         ("m", _ts("2024-01-01 00:00:10"), False),
         ("n", _ts("2024-01-01 00:00:00"), True),
         ("n", _ts("2024-01-01 00:00:11"), False)],
        "mid string, ts timestamp_ntz, is_start boolean",
    )
    out = jump_out_batch(
        df, "mid", "ts", F.col("is_start"), timeout_seconds=10
    )
    got = {(r["mid"], r["ts"]) for r in out.collect()}
    # m: follower at exactly 10 s keeps the session alive; n: 11 s bounces
    # (and n's follower is not a start so only the start row emits)
    assert got == {("n", _ts("2024-01-01 00:00:00"))}


def test_first_per_period_same_instant_tiebreak(spark):
    df = spark.createDataFrame(
        [("u", _ts("2024-01-01 00:00:00"), 2),
         ("u", _ts("2024-01-01 00:00:00"), 1)],
        "uid string, ts timestamp_ntz, seq int",
    )
    out = first_per_period(df, "uid", "ts", tiebreak=("seq",)).collect()
    assert len(out) == 1 and out[0]["seq"] == 1


def test_tumble_window_boundary(spark):
    # event exactly on a boundary belongs to the window it starts
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:10"),), (_ts("2024-01-01 00:00:09"),)],
        "ts timestamp_ntz",
    )
    out = tumble_agg(df, "ts", "10 seconds", [], {"n": F.count(F.lit(1))})
    got = {r["stt"]: r["n"] for r in out.collect()}
    assert got == {
        _ts("2024-01-01 00:00:00"): 1,
        _ts("2024-01-01 00:00:10"): 1,
    }


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame(
        [("one two",), ("one two three",), ("",)], "text string"
    )
    out = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert [len(r["sh"]) for r in out] == [0, 1, 0]
    assert out[1]["sh"] == ["one two three"]


def test_bpe_pretokenizer_segments(spark):
    from realtime_gmall_flink_spark.functions.tokenize import (
        bpe_token_count,
        bpe_tokenize,
    )

    df = spark.createDataFrame(
        [("it's 42%, don't stop",), ("",), ("   ",)], "text string"
    )
    rows = df.select(
        bpe_tokenize("text").alias("t"), bpe_token_count("text").alias("n")
    ).collect()
    # contractions split off; digits/punct are their own runs with the
    # leading space attached; whitespace-only text is one run.
    assert rows[0]["t"] == [
        "it", "'s", " 42", "%,", " don", "'t", " stop",
    ]
    assert [r["n"] for r in rows] == [7, 0, 1]


def test_bpe_exact_counts_fixture_pinned(spark):
    """Merged counts for the shipped merges table, hand-computed: 'the'
    folds t+h then th+e to ONE symbol; ' cat' only merges a+t; 'running'
    folds i+n then in+g."""
    from realtime_gmall_flink_spark.functions.tokenize import (
        bpe_apply,
        bpe_exact_count_udf,
        load_merges,
    )

    ranks = {p: i for i, p in enumerate(load_merges())}
    assert bpe_apply("the", ranks) == ["the"]
    assert bpe_apply(" cat", ranks) == [" ", "c", "at"]
    assert bpe_apply("running", ranks) == ["r", "u", "n", "n", "ing"]

    cnt = bpe_exact_count_udf(spark)
    df = spark.createDataFrame(
        [("the cat",), ("running",), ("",), (None,)], "text string"
    )
    rows = df.select(cnt("text").alias("n")).collect()
    assert [r["n"] for r in rows] == [4, 5, 0, 0]


def test_bpe_exact_at_least_pre_token_proxy(spark):
    """Per doc: merged-symbol count >= pre-token count (each pre-token
    folds to >= 1 symbol) — the 'stable lower bound' claim of the
    proxy, now checked against the real fold."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.catalog import catalog

    from .conftest import SF_DIR

    df = catalog()["doc_token_counts_bpe_exact"].builder(spark, SF_DIR)
    bad = df.filter(
        F.col("bpe_exact_tokens") < F.col("bpe_pre_tokens")
    ).count()
    assert bad == 0


def test_bpe_exact_catalog_matches_python(spark):
    """The catalog entry's numeric gate (no DuckDB oracle exists for an
    iterative fold): the Spark UDF column must equal a direct Python
    recomputation over every sf0.001 document."""
    import re

    from realtime_gmall_flink_spark.functions.tokenize import (
        BPE_PATTERN,
        bpe_apply,
        load_merges,
    )
    from realtime_gmall_flink_spark.plans.catalog import catalog
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    ranks = {p: i for i, p in enumerate(load_merges())}
    pat = re.compile(BPE_PATTERN)
    expected = {
        r["doc_id"]: sum(
            len(bpe_apply(tok, ranks)) for tok in pat.findall(r["text"])
        )
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        r["doc_id"]: r["bpe_exact_tokens"]
        for r in catalog()["doc_token_counts_bpe_exact"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert got == expected


def test_misra_gries_candidates_superset(spark):
    """Every token above the global threshold must survive pass 1 —
    including one drowned in distinct noise and arriving LAST in its
    partition (the adversarial order for counter eviction)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import (
        misra_gries_candidates,
    )

    noise = [(f"noise{i}",) for i in range(5000)]
    heavy = [("hot",)] * 300
    df = spark.createDataFrame(noise + heavy, "w string").repartition(4)
    k = 50  # threshold n/k = 106; 'hot' (300) must survive
    cand = {
        r["w"] for r in misra_gries_candidates(df, "w", k).collect()
    }
    assert "hot" in cand
    # and the two-pass result is exact: candidates verified by count
    total = df.count()
    exact = {
        r["w"]
        for r in df.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > total / k)
        .collect()
    }
    got = {
        r["w"]
        for r in df.join(
            F.broadcast(
                misra_gries_candidates(df, "w", k).withColumnRenamed(
                    "w", "w"
                )
            ),
            "w",
            "left_semi",
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > total / k)
        .collect()
    }
    assert got == exact == {"hot"}


def test_doc_chunk_boundaries(spark, tmp_path, monkeypatch):
    """Chunk windows: stride walks the token array, the last chunk is the
    clamped remainder, consecutive chunks overlap by SIZE-STRIDE tokens,
    empty docs produce no chunks."""
    import realtime_gmall_flink_spark.plans.textops as T

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(T, "_docs", lambda spark, sf: docs)
    rows = {
        (r.doc_id, r.chunk_id): (r.chunk_tokens, r.chunk_text.split())
        for r in T.doc_chunks(spark, "unused").collect()
    }
    # doc 1: starts 0,48,96 -> 64, 52, 4 tokens; overlap of 16
    assert rows[(1, 0)][0] == 64 and rows[(1, 1)][0] == 52
    assert rows[(1, 2)] == (4, ["t96", "t97", "t98", "t99"])
    assert rows[(1, 0)][1][48:] == rows[(1, 1)][1][:16]
    assert rows[(2, 0)] == (2, ["a", "b"])
    assert not any(d == 3 for d, _ in rows)


def test_asof_join_strict_inclusive_and_nomatch(spark):
    from realtime_gmall_flink_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("K", 10, "e1"), ("K", 20, "e2"), ("Q", 5, "e3")],
        "k string, t long, ev string",
    )
    right = spark.createDataFrame(
        [("K", 10, "r10"), ("K", 15, "r15a"), ("K", 15, "r15b")],
        "k string, t long, rid string",
    )
    strict = {
        r["ev"]: r["asof_rid"]
        for r in asof_join(
            left, right, "k", "t", "t", ["rid"], strict=True,
            tiebreak="rid",
        ).collect()
    }
    # e1@10: r@10 excluded (strict) -> null; e2@20: latest of the two
    # equal-ts r@15 rows by tiebreak; Q has no right rows at all
    assert strict == {"e1": None, "e2": "r15b", "e3": None}
    incl = {
        r["ev"]: r["asof_rid"]
        for r in asof_join(
            left, right, "k", "t", "t", ["rid"], strict=False,
            tiebreak="rid",
        ).collect()
    }
    assert incl["e1"] == "r10"


def test_interval_join_bounds_inclusive_vs_duckdb(spark):
    """Flink's intervalJoin.between is inclusive on BOTH bounds; rows
    landing exactly on left_ts + lower and left_ts + upper must join
    (regression: the lower bound was strict). Expected pairs come from a
    DuckDB oracle over the same rows."""
    import duckdb

    from realtime_gmall_flink_spark.operators.joins import interval_join

    lrows = [("K", "2024-05-01 10:00:00", "L1")]
    rrows = [
        ("K", "2024-05-01 10:00:04", "before_lower"),
        ("K", "2024-05-01 10:00:05", "on_lower"),
        ("K", "2024-05-01 10:10:00", "inside"),
        ("K", "2024-05-01 10:30:00", "on_upper"),
        ("K", "2024-05-01 10:30:01", "after_upper"),
    ]
    left = spark.createDataFrame(
        lrows, "k string, lt string, lid string"
    ).select("k", F.to_timestamp("lt").alias("lt"), "lid")
    right = spark.createDataFrame(
        rrows, "k string, rt string, rid string"
    ).select(F.col("k").alias("rk"), F.to_timestamp("rt").alias("rt"), "rid")

    got = {
        r["rid"]
        for r in interval_join(
            left,
            right.withColumnRenamed("rk", "k"),
            "k",
            "lt",
            "rt",
            "5 seconds",
            "30 minutes",
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', TIMESTAMP '{t}', '{i}')" for k, t, i in lrows)
        + ") t(k, lt, lid)"
    )
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', TIMESTAMP '{t}', '{i}')" for k, t, i in rrows)
        + ") t(k, rt, rid)"
    )
    expected = {
        row[0]
        for row in con.execute(
            "SELECT rid FROM l JOIN r ON l.k = r.k"
            " AND r.rt >= l.lt + INTERVAL 5 SECOND"
            " AND r.rt <= l.lt + INTERVAL 30 MINUTE"
        ).fetchall()
    }
    assert expected == {"on_lower", "inside", "on_upper"}
    assert got == expected


def test_predict_language_tie_and_none(spark):
    df = spark.createDataFrame(
        [("xyzzy plugh",),          # no stopword hits -> und
         ("the la",),               # en=1 es=1 tie -> first declared (en)
         ("el la de que y",)],      # es wins
        "text string",
    )
    out = [r["p"] for r in df.select(predict_language("text").alias("p")).collect()]
    assert out == ["und", "en", "es"]


def test_cosine_identical_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])],
        "a array<double>, b array<double>",
    )
    out = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("c")
    ).collect()
    assert abs(out[0]["c"] - 1.0) < 1e-12


def test_jaccard_stop_shingle_cap_bounds_pair_space(spark):
    """One viral shingle shared by every doc must not produce f^2 pairs:
    with max_df below the viral df, pairs exist only through rarer
    shingles. Docs 0/1 are true near-dups through non-viral shingles;
    docs 2..9 overlap ONLY via the viral boilerplate shingle."""
    from realtime_gmall_flink_spark.plans.textops import jaccard_pairs

    viral = "lorem ipsum dolor"  # one 3-shingle, present in all docs
    rows = [
        (0, viral + " alpha beta gamma delta"),
        (1, viral + " alpha beta gamma delta"),
    ] + [(i, viral + f" unique{i} only{i} token{i}") for i in range(2, 10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_pairs(docs, threshold=0.5, max_df=5).collect()
    # the viral shingle (df=10 > 5) is dropped; only the 0-1 pair remains
    assert {(r.doc_a, r.doc_b) for r in capped} == {(0, 1)}

    uncapped = jaccard_pairs(docs, threshold=0.05, max_df=1000)
    # without the cap the viral shingle alone generates all 45 pairs
    assert uncapped.count() == 45


def test_salted_join_equals_plain_join(spark):
    """salted_join must return exactly the plain join's rows (inner and
    left), with the hot key's probe spread across salt buckets."""
    from realtime_gmall_flink_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 0), ("miss", 1)],
        "k string, v long",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")],
        "k string, attr string",
    )
    plain = big.join(dim, "k").select("k", "v", "attr")
    salted = salted_join(big, dim, ["k"], buckets=8).select(
        "k", "v", "attr"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    plain_l = big.join(dim, "k", "left").select("k", "v", "attr")
    salted_l = salted_join(big, dim, ["k"], buckets=8, how="left").select(
        "k", "v", "attr"
    )
    assert sorted(
        map(tuple, salted_l.collect()), key=str
    ) == sorted(map(tuple, plain_l.collect()), key=str)


def test_asof_join_as_event_time_temporal_join(spark):
    """Flink's event-time temporal table join (FOR SYSTEM_TIME AS OF —
    the versioned-dim variant of J3): enrich each fact with the dim
    version in effect AT ITS EVENT TIME, not the latest snapshot.
    asof_join with strict=False is exactly that operator."""
    from realtime_gmall_flink_spark.operators.joins import asof_join

    dim_versions = spark.createDataFrame(
        [("sku1", 100, "9.99"), ("sku1", 200, "12.99"),
         ("sku2", 150, "5.00")],
        "sku string, valid_from long, price string",
    )
    facts = spark.createDataFrame(
        [("sku1", 150, "o1"),   # between v1 and v2 -> 9.99
         ("sku1", 200, "o2"),   # exactly at v2 -> 12.99 (inclusive)
         ("sku1", 250, "o3"),   # after v2 -> 12.99
         ("sku2", 100, "o4")],  # before any version -> null
        "sku string, ts long, order_id string",
    )
    got = {
        r["order_id"]: r["asof_price"]
        for r in asof_join(
            facts, dim_versions, "sku", "ts", "valid_from",
            ["price"], strict=False, tiebreak="price",
        ).collect()
    }
    assert got == {"o1": "9.99", "o2": "12.99", "o3": "12.99", "o4": None}


def _jieba_available() -> bool:
    try:
        import jieba  # noqa: F401

        return True
    except ImportError:
        return False


def test_jieba_tokenizer_gate_matches_availability():
    """The optional CJK tokenizer must mirror package availability:
    None (callers fall back to the pinned split tokenizer, the QUIRKS.md
    divergence) when jieba is absent, a usable UDF when present."""
    from realtime_gmall_flink_spark.functions.tokenize import (
        jieba_tokenizer,
    )

    udf = jieba_tokenizer()
    assert (udf is not None) == _jieba_available()


@pytest.mark.skipif(not _jieba_available(), reason="jieba not installed")
def test_jieba_tokenizer_cuts_cjk(spark):
    """Runs only where jieba exists (not this container): CJK text must
    split into multi-char words, not single codepoints."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.tokenize import (
        jieba_tokenizer,
    )

    cut = jieba_tokenizer()
    rows = spark.createDataFrame(
        [("小米手机京东自营",)], "item string"
    ).select(cut(F.col("item")).alias("words")).collect()
    words = rows[0]["words"]
    assert words and any(len(w) > 1 for w in words)


def test_sequence_packing_conserves_tokens_and_docs(spark):
    """Packing is a partition of the corpus: bucket doc counts sum to
    the table's doc count, token sums to the corpus whitespace-token
    total, and per-bucket invariants hold (straddlers < docs; every
    non-trivial bucket fills most of its sequences: avg_fill in
    (0, 1 + max_doc_overflow])."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import (
        PACK_BUCKETS,
        PACK_BUDGET,
        sequence_packing_stats,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    rows = sequence_packing_stats(spark, SF_DIR).collect()
    assert 0 < len(rows) <= PACK_BUCKETS
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    total_toks = docs.select(
        F.sum(
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("t")
    ).head()["t"]
    assert sum(r["doc_ct"] for r in rows) == n_docs
    assert sum(r["token_sum"] for r in rows) == total_toks
    for r in rows:
        assert 0 <= r["straddler_ct"] < r["doc_ct"], r
        # chop semantics: covered sequences are contiguous, so the
        # count is exactly ceil(tokens/budget) and only the last
        # sequence can be partial (fill never exceeds 1)
        assert r["seq_ct"] == -(-r["token_sum"] // PACK_BUDGET), r
        assert 0 < r["avg_fill"] <= 1.0, r


def test_duplicate_ngram_coverage_flags_planted_duplicates(spark):
    """A corpus of unique docs plus one exactly-duplicated doc: the
    duplicated pair's shingles are 100% covered, unique docs 0%, and
    the per-lang rollup reflects exactly that."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import shingle_hashes

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "epsilon zeta eta theta", "en"),
            (3, "alpha beta gamma delta", "en"),  # exact dup of 1
            (4, "uno dos tres cuatro cinco", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    sh = shingle_hashes(docs, "text", 3)
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias(
                "dup_sh"
            ),
        )
    )
    got = {r["doc_id"]: (r["n_sh"], r["dup_sh"]) for r in per_doc.collect()}
    assert got == {1: (2, 2), 2: (2, 0), 3: (2, 2), 4: (3, 0)}


def test_duplicated_span_planted_fixture(spark):
    """Planted 20-word shared block between two docs: the duplicated
    positions are exactly those whose 8-gram lies inside the block (13
    consecutive -> max_run 13 -> span 20 tokens); boundary-crossing
    grams stay unique; a fully-unique doc reports zero."""
    from realtime_gmall_flink_spark.plans.textops import (
        SPAN_K,
        duplicated_span_per_doc,
    )

    shared = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"x1 {shared} y1 y2 y3"),
            (2, f"z1 z2 {shared} q1"),
            (3, " ".join(f"u{i}" for i in range(24))),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_pos"], r["dup_pos"], r["max_run"])
        for r in duplicated_span_per_doc(docs).collect()
    }
    # doc1: 24 words -> 17 positions; shared block at offset 2..21
    # (1-based) -> dup positions 2..14 = 13
    assert got[1] == (24 - SPAN_K + 1, 13, 13)
    # doc2: 23 words -> 16 positions; block at 3..22 -> dup 3..15 = 13
    assert got[2] == (23 - SPAN_K + 1, 13, 13)
    assert got[3] == (24 - SPAN_K + 1, 0, 0)
    # span length in tokens = max_run + k - 1 = the 20-word block
    assert 13 + SPAN_K - 1 == 20


def test_snapshot_diff_categories_and_skinny_join(spark):
    """snapshot_diff end to end on the deterministic fixture: (a) the
    per-category counts reconcile exactly against the bucket
    definition (removed = bucket<10 docs, changed = bucket [10,20),
    added = bucket [20,25) clones, unchanged = the rest); (b) an
    'added' row takes its lang from the NEXT side (the base side is
    NULL there — a coalesce bug would emit NULL langs); (c) the diff
    plan joins SKINNY fingerprint projections — no Exchange in the
    plan carries the text column, so 100 TB of document bodies never
    shuffle."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import (
        SNAP_ADD_HI,
        SNAP_CHG_HI,
        SNAP_DEL_HI,
        _docs,
        simulated_next_snapshot,
        snapshot_diff,
        split_bucket,
    )

    from .conftest import SF_DIR

    docs = _docs(spark, SF_DIR)
    b = split_bucket("doc_id")
    want = {
        "removed": docs.filter(b < SNAP_DEL_HI).count(),
        "changed": docs.filter(
            (b >= SNAP_DEL_HI) & (b < SNAP_CHG_HI)
        ).count(),
        "added": docs.filter(
            (b >= SNAP_CHG_HI) & (b < SNAP_ADD_HI)
        ).count(),
    }
    want["unchanged"] = docs.count() - want["removed"] - want["changed"]
    diff = snapshot_diff(docs, simulated_next_snapshot(docs))
    got = {
        r["category"]: r["ct"]
        for r in diff.groupBy("category")
        .agg(F.count(F.lit(1)).alias("ct"))
        .collect()
    }
    assert got == want
    assert (
        diff.filter(
            (F.col("category") == "added") & F.col("lang").isNull()
        ).count()
        == 0
    )
    # (c) no shuffle moves document text
    plan = diff._jdf.queryExecution().executedPlan().toString()
    for chunk in plan.split("Exchange")[1:]:
        header = chunk.splitlines()[0]
        assert "text" not in header, header


def test_snapshot_diff_null_text_categories(spark):
    """Side-presence must not key on a data column: md5(NULL) is NULL,
    so a fingerprint-based presence check would call a both-sides
    NULL-text doc 'added' and a NULL<->text edit 'added'/'removed'.
    The marker-column form classifies all four NULL shapes right."""
    from realtime_gmall_flink_spark.plans.textops import snapshot_diff

    schema = "doc_id long, lang string, text string"
    base = spark.createDataFrame(
        [(1, "en", None), (2, "en", None), (3, "en", "x")], schema
    )
    nxt = spark.createDataFrame(
        [(1, "en", None), (2, "en", "y"), (4, "de", None)], schema
    )
    got = {
        r["doc_id"]: r["category"]
        for r in snapshot_diff(base, nxt).collect()
    }
    assert got == {
        1: "unchanged",  # NULL on both sides = same content
        2: "changed",  # NULL -> 'y'
        3: "removed",  # base only, even with NULL text
        4: "added",  # next only, even with NULL text
    }


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """The training-shard materialization: (a) shard directories
    partition the corpus exactly (every doc in precisely the shard its
    id hashes to, none lost or duplicated); (b) INSIDE every written
    file rows sit in training order (md5 of doc_id ascending — what a
    sequential loader consumes as a pre-shuffled stream); (c) the
    stats entry's per-shard counts equal the written layout's."""
    import glob
    import hashlib
    import os

    import pyarrow.parquet as pq

    from realtime_gmall_flink_spark.plans.textops import (
        N_TRAINING_SHARDS,
        training_shard_stats,
        write_training_shards,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out)

    def md5(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    seen = {}
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        assert 0 <= shard < N_TRAINING_SHARDS
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            hs = [md5(i) for i in ids]
            # (b) within-file training order
            assert hs == sorted(hs), f
            for i in ids:
                # (a) correct shard, no duplicates
                assert int(md5(i)[:4], 16) % N_TRAINING_SHARDS == shard
                assert i not in seen
                seen[i] = shard
    corpus = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(seen) == corpus
    # (c) stats agree with the layout
    per_shard = {}
    for i, s in seen.items():
        per_shard[s] = per_shard.get(s, 0) + 1
    stats = {
        r["shard"]: r["doc_ct"]
        for r in training_shard_stats(spark, SF_DIR).collect()
    }
    assert stats == per_shard
