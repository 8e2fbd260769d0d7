"""Property-based tests: Spark operators vs pure-Python references on
random inputs (small example counts — each example is a Spark job)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.operators.dedup import latest_row_per_key
from realtime_gmall_flink_spark.operators.visitor import gap_flag

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=0, max_value=5),     # version
        st.integers(min_value=0, max_value=99),    # unique-ish seq
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(ROWS)
def test_latest_row_matches_python(spark_global, rows):
    # make seq unique so ordering is total
    rows = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    df = spark_global.createDataFrame(rows, "k string, v int, seq int")
    got = {
        (r["k"], r["v"], r["seq"])
        for r in latest_row_per_key(df, ["k"], ["v", "seq"]).collect()
    }
    expected = {}
    for k, v, seq in rows:
        if k not in expected or (v, seq) > (
            expected[k][1], expected[k][2]
        ):
            expected[k] = (k, v, seq)
    assert got == set(expected.values())


DAYS = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=15
)


@settings(max_examples=8, deadline=None)
@given(DAYS)
def test_gap_flag_matches_python(spark_global, day_offsets):
    days = sorted(set(day_offsets))
    from datetime import date, timedelta

    base = date(2024, 1, 1)
    dates = [base + timedelta(days=d) for d in days]
    df = spark_global.createDataFrame(
        [("u", d) for d in dates], "uid string, ts date"
    )
    got = {
        r["ts"]: r["is_back"]
        for r in gap_flag(df, "uid", "ts", min_gap_days=8).collect()
    }
    expected = {}
    prev = None
    for d in dates:
        expected[d] = 1 if prev is not None and (d - prev).days >= 8 else 0
        prev = d
    assert got == expected


# session-scoped spark fixture adapted for hypothesis (function-scoped
# fixtures interact badly with @given)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


DOCS = st.lists(
    st.lists(
        st.sampled_from(["apple", "banana", "cherry", "date", "elder"]),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(DOCS)
def test_jaccard_pairs_match_python_brute_force(spark_global, token_lists):
    """The codegen shingle pipeline must equal an O(n^2) pure-Python
    reference: same pairs, same jaccard values (tiny token alphabet
    forces shared shingles and duplicate shingles within a doc)."""
    from realtime_gmall_flink_spark.plans.textops import jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark_global.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in jaccard_pairs(df, threshold=0.2, max_df=1000).collect()
    }

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    expected = {}
    sets = {i: shingles(t) for i, t in enumerate(token_lists)}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = inter / union
                if j >= 0.2:
                    expected[(a, b)] = round(j, 9)
    assert got == expected


def test_jaccard_exact_threshold_non_dyadic(spark_global):
    """A pair at exactly J = 1/5 must survive threshold=0.2: double(1/5)
    equals double(0.2), so the float filter keeps it, and the size prune
    must not be 1 ulp stricter (regression for the as_integer_ratio
    prune that dropped it)."""
    from realtime_gmall_flink_spark.plans.textops import jaccard_pairs

    # 3 shingles each, sharing exactly one -> inter=1, union=5, J=1/5
    rows = [(0, "x y z p q"), (1, "x y z r s")]
    df = spark_global.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.2, max_df=1000).collect()
    }
    assert got == {(0, 1): 0.2}


def test_jaccard_many_shingles_no_overflow(spark_global):
    """Docs with >511 shingles must still pair up under a non-dyadic
    threshold (regression for n * t_den BIGINT overflow in the old
    integer-ratio prune)."""
    from realtime_gmall_flink_spark.plans.textops import jaccard_pairs

    text = " ".join(f"w{i}" for i in range(600))  # 598 distinct shingles
    df = spark_global.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    got = jaccard_pairs(df, threshold=0.2, max_df=1000).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in got] == [
        (0, 1, 1.0)
    ]


EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(EDGE_LISTS)
def test_min_label_components_match_union_find(spark_global, edge_list):
    """The iterative DataFrame propagation must equal a pure-Python
    union-find on arbitrary graphs (self-loops, parallel edges, multiple
    components, isolated nodes)."""
    from realtime_gmall_flink_spark.plans.textops import (
        min_label_components,
    )

    n = 16
    nodes = spark_global.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    pairs = spark_global.createDataFrame(
        [(a, b) for a, b in edge_list] or [(0, 0)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in min_label_components(nodes, pairs).collect()
    }

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for i in range(n):
        root = find(i)
        expected[i] = min(j for j in range(n) if find(j) == root)
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(EDGE_LISTS)
def test_star_contraction_components_match_union_find(
    spark_global, edge_list
):
    """Large-star/small-star contraction must equal the same pure-Python
    union-find on arbitrary graphs (self-loops, parallel edges,
    multiple components, isolated nodes) — on BOTH paths: the
    driver-fall-through (default for these sizes) and the distributed
    contraction loop (forced with driver_fallthrough_max=0)."""
    from realtime_gmall_flink_spark.plans.textops import (
        _star_contraction,
        star_contraction_components,
    )

    n = 16
    nodes = spark_global.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    pairs = spark_global.createDataFrame(
        [(a, b) for a, b in edge_list] or [(0, 0)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in star_contraction_components(nodes, pairs).collect()
    }
    dist_labels, _ = _star_contraction(
        nodes, pairs, "doc_id", "cluster_id", driver_fallthrough_max=0
    )
    got_dist = {
        r["doc_id"]: r["cluster_id"] for r in dist_labels.collect()
    }
    assert got == got_dist

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for i in range(n):
        root = find(i)
        expected[i] = min(j for j in range(n) if find(j) == root)
    assert got == expected


def test_star_contraction_chain_rounds_logarithmic(spark_global):
    """A 64-node path graph: min-label propagation needs 63 rounds (one
    per hop of diameter); contraction must label it in <=8 — the
    log-vs-diameter property that makes the 100 TB near-dup graph
    tractable."""
    from realtime_gmall_flink_spark.plans.textops import _star_contraction

    n = 64
    nodes = spark_global.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    chain = spark_global.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = _star_contraction(
        nodes, chain, "doc_id", "cluster_id", driver_fallthrough_max=0
    )
    assert 0 < rounds <= 8, f"contraction took {rounds} rounds on a 64-chain"
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


DOC_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(DOC_TEXTS)
def test_repetition_stats_match_python(spark_global, token_lists):
    """doc_repetition_stats (exploded term stats + columnar bigram
    branch) must equal a direct Python computation, including 1-token
    docs (empty bigram list — the sequence(1,0) descending-array trap)
    and empty docs (dropped, like the oracle)."""
    from unittest.mock import patch

    from realtime_gmall_flink_spark.plans import textops

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark_global.createDataFrame(rows, "doc_id long, text string")
    with patch.object(textops, "_docs", lambda spark, sf: df):
        got = {
            r["doc_id"]: (
                r["n_words"],
                round(r["distinct_word_ratio"], 9),
                round(r["top_term_ratio"], 9),
                round(r["dup_bigram_frac"], 9),
            )
            for r in textops.doc_repetition_stats(
                spark_global, "unused"
            ).collect()
        }

    expected = {}
    for i, toks in enumerate(token_lists):
        if not toks:
            continue  # no tokens -> no term rows -> doc absent
        n = len(toks)
        from collections import Counter

        c = Counter(toks)
        bigrams = [
            f"{toks[j]} {toks[j + 1]}" for j in range(n - 1)
        ]
        dup = (
            round(1.0 - len(set(bigrams)) / len(bigrams), 6)
            if bigrams
            else 0.0
        )
        expected[i] = (
            n,
            round(round(len(c) / n, 6), 9),
            round(round(max(c.values()) / n, 6), 9),
            round(dup, 9),
        )
    assert got == expected


PACK_TOKS = st.lists(
    st.integers(min_value=0, max_value=1300),  # includes docs > budget
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(PACK_TOKS)
def test_sequence_packing_matches_python(spark_global, tok_counts):
    """The windowed packing arithmetic must equal a pure-Python
    reference: hash-ordered running sum, seq = cum DIV budget, straddle
    when a doc crosses a boundary, seq_ct = ceil(total/budget)."""
    import hashlib

    from realtime_gmall_flink_spark.plans.textops import PACK_BUDGET

    B = PACK_BUDGET
    docs = [(i, " ".join(["w"] * n) if n else "") for i, n in
            enumerate(tok_counts)]
    df = spark_global.createDataFrame(docs, "doc_id long, text string")

    # Spark: the same expressions as the catalog entry, single bucket
    # (bucketing is orthogonal hash routing; the arithmetic under test
    # is the within-shard window)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # token counts fed directly (empty text -> 0; Spark's size(split))
    # quirk on "" is the catalog entry's _WORDS filter concern, not the
    # window arithmetic under test here)
    d = df.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    ).join(
        spark_global.createDataFrame(
            [(i, n) for i, n in enumerate(tok_counts)],
            "doc_id long, toks long",
        ),
        "doc_id",
    ).select("doc_id", "ord", "toks")
    c = d.withColumn("cum", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    got = {
        r["doc_id"]: (r["cum"], r["straddle"])
        for r in c.select(
            "doc_id",
            "cum",
            F.when(
                F.col("cum") + F.col("toks")
                > (F.expr(f"cum DIV {B}") + 1) * B,
                1,
            ).otherwise(0).alias("straddle"),
        ).collect()
    }

    # pure-Python reference
    order = sorted(
        range(len(tok_counts)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    cum = 0
    want = {}
    for i in order:
        n = tok_counts[i]
        straddle = 1 if cum + n > (cum // B + 1) * B else 0
        want[i] = (cum, straddle)
        cum += n
    assert got == want
    # aggregate invariant checked against the SPARK aggregation: the
    # catalog entry's seq_ct expression over these rows must equal the
    # pure-Python ceil(total/B)
    total = sum(tok_counts)
    spark_seq_ct = d.groupBy().agg(
        F.expr(f"(sum(toks) + {B - 1}) DIV {B}").alias("seq_ct")
    ).head()["seq_ct"]
    assert spark_seq_ct == -(-total // B)


SQ8_VALS = st.lists(
    st.floats(
        min_value=-100.0, max_value=100.0,
        allow_nan=False, allow_infinity=False, width=32,
    ),
    min_size=4,
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(SQ8_VALS, min_size=2, max_size=8))
def test_sq8_roundtrip_error_bounded(spark_global, vecs):
    """Quantize-dequantize error is bounded by half a quantization step
    per dimension (the midpoint-reconstruction guarantee), and codes
    round-trip the tinyint shift exactly."""
    from realtime_gmall_flink_spark.plans.vectors import (
        _sq8_stats,
        sq8_code_deq,
        sq8_quantize,
    )

    df = spark_global.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    stats = _sq8_stats(df)
    deq = (
        df.crossJoin(F.broadcast(stats.select("mn", "mx")))
        .select(
            "vec_id",
            "embedding",
            "mn",
            "mx",
            sq8_code_deq(
                sq8_quantize(F.col("embedding"), F.col("mn"), F.col("mx")),
                F.col("mn"),
                F.col("mx"),
            ).alias("deq"),
        )
        .collect()
    )
    for r in deq:
        for x, d, lo, hi in zip(r["embedding"], r["deq"], r["mn"], r["mx"]):
            if hi > lo:
                step = (hi - lo) / 256.0
                assert abs(float(x) - d) <= step / 2 + 1e-12, (x, d)
            else:
                assert d == lo


IDS = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62),
    min_size=1,
    max_size=30,
    unique=True,
)


@settings(max_examples=8, deadline=None)
@given(IDS, st.integers(min_value=1, max_value=64))
def test_shard_and_split_hash_match_python_md5(
    spark_global, ids, n_shards
):
    """The engine-portability claim behind every hash split/shard:
    Spark's split_bucket/shard_id/training_order equal pure-Python md5
    of the id's decimal string for ARBITRARY bigints (negative ids
    included — the CAST-to-string forms must agree on the sign
    rendering) at any modulus."""
    import hashlib

    from realtime_gmall_flink_spark.plans.textops import (
        shard_id,
        split_bucket,
        training_order,
    )

    df = spark_global.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["b"], r["s"], r["o"])
        for r in df.select(
            "doc_id",
            split_bucket("doc_id").alias("b"),
            shard_id("doc_id", n_shards).alias("s"),
            training_order("doc_id").alias("o"),
        ).collect()
    }
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        prefix = int(h[:4], 16)
        assert got[i] == (prefix % 100, prefix % n_shards, h), i
