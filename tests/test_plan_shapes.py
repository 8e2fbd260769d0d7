"""Plan-shape regression tests: the performance properties documented in
docs/PLANS.md must survive refactors — pushdown reaching the scan,
broadcast-only dim pyramids, WindowGroupLimit on the dedup."""

from __future__ import annotations

from realtime_gmall_flink_spark.plans.catalog import catalog

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    df = catalog()["tpch_q1"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # projection pruning: a column the query never touches must not be read
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_enrichment_is_broadcast_only(spark):
    df = catalog()["order_detail_enriched"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # the fact side must not be exchanged for the joins
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_dedup_uses_window_group_limit(spark):
    df = catalog()["dedup_latest_event"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan


def test_jaccard_single_scan(spark):
    df = catalog()["near_dup_jaccard"].builder(spark, SF_DIR)
    plan = _plan(df)
    # one parquet scan of documents, no self-join re-scan
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # the doc_id-keyed CPU-spread is the ONLY doc_id exchange: the
    # shingle window and per-doc distinct reuse it, so the exploded
    # token rows (k x corpus text) are never shuffled — only raw docs
    # once, then 8-byte hashes
    assert plan.count("hashpartitioning(doc_id") <= 2  # tree + detail
    assert "RoundRobinPartitioning" not in plan


def test_q6_pure_scan_no_join_no_key_shuffle(spark):
    df = catalog()["tpch_q6_revenue_change"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    # only the global partial/final agg boundary, no hashpartitioning
    assert "Exchange hashpartitioning" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_q10_dims_broadcast_fact_shuffles_once(spark):
    df = catalog()["tpch_q10_returned_revenue"].builder(spark, SF_DIR)
    plan = _plan(df)
    # customer + nation always broadcast; at test SF AQE may also
    # broadcast the quarter-filtered orders side (correct adaptively —
    # at scale it reverts to a shuffle join on orderkey)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "EqualTo(l_returnflag,R)" in plan  # filter reached the scan
    # both date bounds pushed too
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_ivf_assignment_shuffle_free(spark):
    """The centroid assignment is a per-row array_max over a broadcast
    centroid array: no per-vector hash shuffle, no window operator — the
    fact side flows from scan to probe join without an Exchange (the old
    crossJoin + row_number form shuffled n*k rows)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivf_centroids,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(ivf_assign(emb, ivf_centroids(emb)))
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row centroid array side

    # the full query keeps that property end to end
    full = _plan(catalog()["ann_ivf_topk"].builder(spark, SF_DIR))
    assert "Window" not in full


def test_ivf_probe_scans_only_nprobe_partitions(spark, tmp_path):
    """The persisted-index probe (build-once/probe-many): the assignment
    FileScan must carry a literal cid IN PartitionFilter — NPROBE of k
    cell partitions listed and read, never the full corpus — and the
    probe plan must not rebuild centroids (no aggregate over the
    embeddings source at all: its only scans are the index itself and
    the one-row query lookup)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_NPROBE,
        QUERY_VEC_ID,
        ivf_build,
        ivf_probe,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-index"))
    import os

    cells = [d for d in os.listdir(f"{idx}/assignment")
             if d.startswith("cid=")]
    assert len(cells) > IVF_NPROBE  # pruning has something to prune

    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    df = ivf_probe(spark, idx, q, exclude_vec_id=QUERY_VEC_ID)
    plan = _plan(df)
    import re

    m = re.search(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert m, plan
    assert len(m.group(1).split(",")) == IVF_NPROBE
    # probe-side plan reads the index, not the corpus: the query vector
    # is fetched once (bounded) and inlined as a literal, so the probe
    # plan holds NO embeddings scan and no Lloyd machinery
    # (posexplode/avg aggregation) anywhere
    assert plan.count("embeddings.parquet") == 0
    assert "posexplode" not in plan


def test_ivf_batch_probe_single_pruned_index_scan(spark, tmp_path):
    """ivf_probe_batch: ONE scan of the persisted assignment regardless
    of query count, pruned to the union of all probed cells; no Lloyd
    machinery in the probe plan."""
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_NPROBE,
        ivf_build,
        ivf_probe_batch,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-batch-index"))
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    df = ivf_probe_batch(spark, idx, queries)
    # toString truncates long FileScan lines; formatted explain prints
    # PartitionFilters complete (IN for short lists, INSET past 10)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    # greedy number-list capture: a lazy form would stop at the first
    # comma and make the cell-count assertion vacuous for INSET
    m = re.search(
        r"PartitionFilters: \[cid#\d+ "
        r"(?:IN \(([0-9]+(?:, ?[0-9]+)*)\)|INSET ([0-9]+(?:, ?[0-9]+)*))",
        plan,
    )
    assert m, plan
    cells = (m.group(1) or m.group(2)).split(",")
    assert len(cells) > 1  # the capture really got the list
    assert len(cells) <= 3 * IVF_NPROBE
    assert plan.count("ivf-batch-index/assignment") == 1
    assert "posexplode" not in plan
    # wrong-width queries are refused vs the persisted centroid
    # geometry, like every PQ-family probe — a mismatched qe would
    # otherwise NULL-score and rank arbitrary rows (ADVICE r10)
    import pytest as _pytest

    bad = queries.select("qid", F.slice("qe", 1, 3).alias("qe"))
    with _pytest.raises(ValueError, match="not 64-dim"):
        ivf_probe_batch(spark, idx, bad)


def test_runtime_bloom_filter_fires_on_selective_join(spark):
    """Spark's runtime Bloom-filter join pruning (on by default, gated
    by scan-size thresholds that test SFs never reach): a selective dim
    filter injects bloom_filter_agg on the build side and might_contain
    into the fact scan, cutting shuffled fact rows before the join. At
    100 TB the default thresholds are met naturally; here they're
    lowered to pin that the engine's session config keeps the feature
    ARMED (a conf regression would silently lose it at scale)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert (
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.enabled"
            )
            == "true"
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_lsh_probe_prunes_to_probed_high_bytes(spark, tmp_path):
    """The persisted LSH layout: the multi-probe scan must carry a
    literal bkt_hi IN PartitionFilter (<=37 of 256 high bytes for a
    hamming<=2 probe) and return exactly the in-memory multiprobe
    result."""
    import os
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.similarity import (
        sign_lsh_bucket,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        lsh_build,
        lsh_probe,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = lsh_build(emb, str(tmp_path / "lsh-index"))
    assert os.path.isdir(f"{idx}/buckets")

    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            F.col("embedding").alias("qe"),
            sign_lsh_bucket(F.col("embedding"), bits=16)
            .cast("int")
            .alias("b"),
        )
        .collect()[0]
    )
    q = spark.createDataFrame([(qrow["qe"],)], ["qe"])
    df = lsh_probe(
        spark, idx, q, qrow["b"], exclude_vec_id=QUERY_VEC_ID
    )
    # the 137-bucket INSET blows past toString's field cap, truncating
    # the FileScan line — formatted explain prints PartitionFilters on
    # its own (complete) line
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(
        r"PartitionFilters: \[bkt_hi#\d+ INSET ([0-9, ]+)\]", plan
    )
    assert m, plan
    assert len(m.group(1).split(",")) <= 37

    from realtime_gmall_flink_spark.plans.vectors import (
        multiprobe_topk_inmem,
    )

    expected = multiprobe_topk_inmem(spark, SF_DIR)
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in expected.collect()
    ]


def test_ann_multiprobe_catalog_entry_probes_persisted_layout(spark):
    """The ann_multiprobe_topk catalog entry is the build-once/
    probe-many form: its plan scans the persisted bkt_hi-partitioned
    layout with a literal PartitionFilter (<=37 of 256 high bytes) and
    contains no bucket-computation or probe-explosion over the corpus
    (no join against an exploded query side, no shuffle at all before
    the top-k), and it still equals the index-free form."""
    import re

    df = catalog()["ann_multiprobe_topk"].builder(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(
        r"PartitionFilters: \[bkt_hi#\d+ INSET ([0-9, ]+)\]", plan
    )
    assert m, plan
    assert len(m.group(1).split(",")) <= 37
    # probe-side work is a broadcast of the 1-row query: the only join
    # is that BroadcastNestedLoopJoin; no hash exchange anywhere
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan  # no probe-mask explode in the probe

    from realtime_gmall_flink_spark.plans.vectors import (
        multiprobe_topk_inmem,
    )

    expected = multiprobe_topk_inmem(spark, SF_DIR)
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in expected.collect()
    ]


def test_pii_redaction_scan_only(spark):
    """doc_pii_redaction_stats is the scan-only family: per-row regex
    count + redaction fingerprint. The ONLY exchange allowed is the
    deliberate doc_id-keyed CPU-spread of the single-row-group test
    file (which disappears on real multi-file input); the query itself
    must add none."""
    df = catalog()["doc_pii_redaction_stats"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_contamination_single_scan_hash_joins(spark):
    df = catalog()["split_contamination"].builder(spark, SF_DIR)
    plan = _plan(df)
    # shingle subtree is computed once per side off one documents scan
    # family; the join key is the 8-byte xxhash64, never shingle text
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan


def test_doc_chunks_no_shuffle(spark):
    # the one allowed exchange is the doc_id-keyed CPU-spread (see
    # test_pii_redaction_scan_only); chunking adds no shuffle of its own
    df = catalog()["doc_chunks"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_topn_per_group_pushes_limit_below_exchange(spark):
    df = catalog()["top_users_per_event_type"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final


# ---------------------------------------------------------------------------
# Scale probes: the same load-bearing plan properties, asserted against an
# 8x self-union of the fact tables (~sf0.8) materialized as real parquet —
# dims stay 1x, like a real scale-up. This turns the "survives 100x"
# claims from prose into regression tests: the properties that make the
# plans linear (WindowGroupLimit both sides, broadcast-only dim pyramids,
# shuffle-free IVF assignment, single-scan self-joins) must not flip to
# quadratic/shuffling shapes when the optimizer sees 8x the rows, and
# result sizes must stay aggregate-sized (no driver materialization that
# grows with the input).
import pytest

_SF8_BASE = "/root/testdata/sf0.1"
_SF8_FACTS = {"events", "documents", "embeddings", "lineitem", "orders"}
_SF8_DIMS = {"customer", "nation", "region", "part", "supplier"}


@pytest.fixture(scope="module")
def sf8_dir(spark, tmp_path_factory):
    from realtime_gmall_flink_spark.sources.testdata import load_table

    root = tmp_path_factory.mktemp("sf8")
    for name in sorted(_SF8_FACTS | _SF8_DIMS):
        df = load_table(spark, _SF8_BASE, name)
        if name in _SF8_FACTS:
            for _ in range(3):
                df = df.unionByName(df)
        df.write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.scale
def test_scale8_dedup_window_group_limit_both_sides(spark, sf8_dir):
    df = catalog()["dedup_latest_event"].builder(spark, sf8_dir)
    plan = _plan(df)
    # partial (map-side) AND final: the per-key top-1 prunes before the
    # exchange, so the shuffle moves one row per key per mapper, not 8x
    # the corpus
    assert plan.count("WindowGroupLimit") == 2
    # output is one row per key — identical to the un-unioned base, i.e.
    # independent of the 8x blow-up (row_number, not rank, breaks ties)
    base = catalog()["dedup_latest_event"].builder(spark, _SF8_BASE)
    assert df.count() == base.count()


@pytest.mark.scale
def test_scale8_ivf_assignment_still_shuffle_free(spark, sf8_dir):
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivf_centroids,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, sf8_dir, "embeddings")
    plan = _plan(ivf_assign(emb, ivf_centroids(emb)))
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan


@pytest.mark.scale
def test_scale8_cascade_broadcast_pyramid_holds(spark, sf8_dir):
    df = catalog()["dim_cascade_region_revenue"].builder(spark, sf8_dir)
    plan = _plan(df)
    # the three dim hops stay broadcast at 8x the fact rows (the fact
    # side never exchanges for enrichment); the lineitem-orders join may
    # legitimately be a shuffle join at this size, but never cartesian
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    # aggregate-sized output: 25 (region x nation) rows regardless of 8x
    assert df.count() == 25


@pytest.mark.scale
def test_scale8_jaccard_single_scan_no_cartesian(spark, sf8_dir):
    df = catalog()["near_dup_jaccard"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1  # shingle subtree reused
    assert "CartesianProduct" not in plan


@pytest.mark.scale
def test_scale8_topk_stays_take_ordered(spark, sf8_dir):
    """ann_cosine_topk at 8x: the top-k must remain a TakeOrdered (driver
    receives k rows, not a sorted corpus)."""
    df = catalog()["ann_cosine_topk"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert len(df.collect()) == 10


@pytest.mark.scale
def test_scale8_heavy_hitter_candidates_stay_bounded(spark, sf8_dir):
    """Pass 1 of the heavy-hitter sketch at 8x: the candidate set must
    stay bounded by partitions * k (O(k) memory per task), and the
    exact pass 2 output must be IDENTICAL to the un-unioned base — an
    8x duplication multiplies every count and the threshold alike, so
    the heavy-hitter set is invariant."""
    from realtime_gmall_flink_spark.plans.textops import (
        HEAVY_HITTER_PHI,
        misra_gries_candidates,
    )
    from realtime_gmall_flink_spark.plans.textops import _docs
    from realtime_gmall_flink_spark.functions.tokenize import (
        explode_tokens,
    )

    words = explode_tokens(_docs(spark, sf8_dir), "text", "w").select("w")
    k = int(2 / HEAVY_HITTER_PHI)
    n_part = words.rdd.getNumPartitions()
    cand_ct = misra_gries_candidates(words, "w", k).count()
    assert cand_ct <= n_part * k

    got = catalog()["heavy_hitter_words"].builder(spark, sf8_dir)
    base = catalog()["heavy_hitter_words"].builder(spark, _SF8_BASE)
    got_set = {(r["w"], r["word_ct"]) for r in got.collect()}
    base_set = {(r["w"], r["word_ct"] * 8) for r in base.collect()}
    assert got_set == base_set


def test_q21_subqueries_decorrelate_to_semi_and_anti_joins(spark):
    """The EXISTS / NOT EXISTS pair in tpch_q21_waiting_suppliers —
    one correlated through a non-equi predicate on an OUTER column —
    must decorrelate into left-semi and left-anti hash joins (no
    per-row subquery re-execution, no cartesian product)."""
    df = catalog()["tpch_q21_waiting_suppliers"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_semi_join_single_pair_aggregation(spark):
    """tpch_q20_excess_shippers: the IN-subquery becomes a left-semi
    join and the pair CTE's two conditional sums come from ONE lineitem
    aggregation (two HashAggregate levels: partial + final), not one
    scan per conditional sum."""
    df = catalog()["tpch_q20_excess_shippers"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # exactly one grouped aggregation over (l_suppkey, l_partkey):
    # partial+final of the same agg — a duplicated CTE would double it
    import re

    pair_aggs = re.findall(
        r"HashAggregate\(keys=\[l_suppkey#\d+L?, l_partkey#\d+L?\]", plan
    )
    assert len(pair_aggs) == 2, plan


@pytest.mark.scale
def test_scale8_bigram_commonness_vocab_bounded(spark, sf8_dir):
    """doc_bigram_commonness at 8x docs: the count-join side is bounded
    by the CHARSET^2 vocabulary, not the corpus — 8x input must produce
    the identical vocabulary cardinality, and the per-doc output stays
    one row per distinct doc (duplicated doc_ids collapse)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import _docs

    def vocab(sf):
        return (
            _docs(spark, sf)
            .filter(F.length("text") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(text) - 1),"
                        " i -> substring(text, i, 2))"
                    )
                ).alias("bg")
            )
            .distinct()
            .count()
        )

    assert vocab(sf8_dir) == vocab(_SF8_BASE)
    df = catalog()["doc_bigram_commonness"].builder(spark, sf8_dir)
    base = catalog()["doc_bigram_commonness"].builder(spark, _SF8_BASE)
    assert df.count() == base.count()
    assert "CartesianProduct" not in _plan(df)


@pytest.mark.scale
def test_scale8_q21_decorrelation_holds(spark, sf8_dir):
    """The q21 EXISTS/NOT EXISTS decorrelation must stay hash-join
    shaped at 8x lineitem — a planner fallback to a nested-loop or
    cartesian form here would be quadratic at scale."""
    df = catalog()["tpch_q21_waiting_suppliers"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_dedup_survivorship_no_cartesian(spark):
    """fuzzy_dedup_survivor_stats composes pair-gen + contraction +
    attribute join + report; nothing in the composition may degrade to
    a cartesian/nested-loop pair enumeration, and the final report must
    be a lang-cardinality aggregate (rows bounded by languages, not
    docs)."""
    df = catalog()["fuzzy_dedup_survivor_stats"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    from realtime_gmall_flink_spark.plans.textops import _docs

    n_langs = _docs(spark, SF_DIR).select("lang").distinct().count()
    assert len(rows) <= n_langs
    # conservation: every doc is either a survivor or removed
    for r in rows:
        assert r["n_docs"] == r["n_survivors"] + r["n_removed"]


def test_filtered_ann_pushes_label_literal_to_scan(spark):
    """ann_filtered_topk: the category filter must be a LITERAL pushed
    into the parquet scan (the partition-pruning shape on a
    label-partitioned layout) and the re-rank a TakeOrdered top-k — a
    refactor that joins the label instead of collecting it would
    silently lose the scan pruning."""
    df = catalog()["ann_filtered_topk"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "EqualTo(label" in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_lsh_batch_probe_single_pruned_scan(spark):
    """ann_multiprobe_batch_topk: ONE scan of the persisted bucket
    layout regardless of query count, pruned to the union of the
    queries' probed high bytes (<= 3*37 of 256); the probe pairs are a
    broadcast join, no probe-mask explode in the plan."""
    import re

    df = catalog()["ann_multiprobe_batch_topk"].builder(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(
        r"PartitionFilters: \[bkt_hi#\d+ "
        r"(?:IN \(([0-9]+(?:, ?[0-9]+)*)\)|INSET ([0-9]+(?:, ?[0-9]+)*))",
        plan,
    )
    assert m, plan
    his = (m.group(1) or m.group(2)).split(",")
    assert 1 < len(his) <= 3 * 37
    assert plan.count("buckets") >= 1
    assert "Generate" not in plan
    # exactly one scan of the index layout
    assert plan.count("/buckets]") + plan.count("/buckets,") <= 1


def test_dup_ngram_coverage_single_scan(spark):
    """The df-counting plan: ONE documents scan (window count over the
    shingle hash, no groupBy+self-join re-evaluating the shingle
    subtree), no pair generator, no cartesian."""
    df = catalog()["duplicate_ngram_coverage"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Scan parquet") <= 2  # docs for shingles + lang
    assert "CartesianProduct" not in plan
    # exactly one posexplode: the shingle subtree is evaluated once
    assert plan.lower().count("posexplode") == 1


def test_curation_funnel_batch_scores_corpus_once(spark):
    """The funnel's per-stage counts are crossJoined independent
    aggregates; the scored corpus and the exact-dedup survivor set are
    persist()ed so NO branch re-derives them from the parquet source
    (and, unlike a checkpoint, construction runs no corpus jobs —
    lazy-checkpointing still executes the shuffle stages at the .rdd
    conversion under AQE). Every LEAF of the main physical plan must
    be a cache scan — a FileSourceScan leaf would mean some branch
    re-reads documents; the one real scan lives inside the cached
    relation, and the scorer itself is single-scan."""
    df = catalog()["curation_pipeline_counts"].builder(spark, SF_DIR)
    jplan = df._jdf.queryExecution().executedPlan()
    top = jplan.collectLeaves().apply(0)
    inner = top.initialPlan() if top.nodeName() == "AdaptiveSparkPlan" else jplan
    lv = inner.collectLeaves()
    names = [lv.apply(i).nodeName() for i in range(lv.size())]
    assert names and set(names) == {"InMemoryTableScan"}, names
    # the single corpus scan lives in the scorer that fed the cache
    from realtime_gmall_flink_spark.plans.textops import score_docs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scorer_plan = _plan(score_docs(docs))
    assert scorer_plan.count("Scan parquet") == 1


def test_sequence_packing_one_shard_exchange(spark):
    """Packing never sorts globally: the only hash exchange is on the
    shard bucket (window partition), and the output is shard-sized."""
    df = catalog()["sequence_packing_stats"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "CartesianProduct" not in plan
    from realtime_gmall_flink_spark.plans.textops import PACK_BUCKETS

    assert df.count() <= PACK_BUCKETS


@pytest.mark.scale
def test_scale8_dup_ngram_coverage_holds(spark, sf8_dir):
    df = catalog()["duplicate_ngram_coverage"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert plan.lower().count("posexplode") == 1
    assert "CartesianProduct" not in plan
    # aggregate-sized output: one row per language regardless of 8x
    assert df.count() <= 16


@pytest.mark.scale
def test_scale8_sq8_probe_still_scan_plus_take_ordered(spark, sf8_dir):
    """SQ8 at 8x: the probe stays a codes scan + TakeOrdered (the
    compact-sweep shape), never a sort of the corpus."""
    df = catalog()["ann_sq8_topk"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "posexplode" not in plan.lower()  # probe, not build, plan
    assert len(df.collect()) == 10


def test_duplicated_span_no_pairs_no_cartesian(spark):
    """Span detection is counting + islands, never pair generation:
    EXACTLY one posexplode — the running-count island key lets one
    evaluation of the gram subtree (the dominant h-shuffle) feed both
    the dup counts and the maximal runs; no cartesian; language-sized
    output."""
    df = catalog()["duplicated_span_stats"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert plan.lower().count("posexplode") == 1
    assert df.count() <= 16


@pytest.mark.scale
def test_scale8_duplicated_span_stays_linear(spark, sf8_dir):
    df = catalog()["duplicated_span_stats"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert plan.lower().count("posexplode") == 1  # one gram subtree
    # aggregate-sized output regardless of 8x input
    assert df.count() <= 16


def test_semantic_dedup_pair_stage_probes_persisted_layout(spark):
    """The semantic_dedup_clusters pair stage is the build-once/
    probe-many form: both sides of the pair join scan the PERSISTED
    lsh_build layout — no bucket recomputation over the corpus (no
    xxhash in the plan) — and the mined pairs equal the index-free
    embedding_near_dup_pairs exactly. A full pair graph must touch
    every occupied partition (the identity mask makes the reachable
    set of the occupied set itself), so NO PartitionFilter is claimed
    here; the genuinely pruned probe is lsh_score_new (next test)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        embedding_near_dup_pairs,
        lsh_build,
        lsh_index_dir,
        lsh_pair_mine,
    )

    idx = lsh_index_dir(SF_DIR)
    lsh_build(_emb(spark, SF_DIR), idx)
    pairs = lsh_pair_mine(spark, idx)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pairs._jdf.queryExecution().explainString(mode)
    # buckets come FROM the layout, never recomputed over the corpus
    assert "xxhash" not in plan.lower()
    assert "CartesianProduct" not in plan

    expected = sorted(
        tuple(r)
        for r in embedding_near_dup_pairs(_emb(spark, SF_DIR)).collect()
    )
    assert sorted(tuple(r) for r in pairs.collect()) == expected


def test_lsh_score_new_prunes_to_batch_reachable_partitions(spark):
    """lsh_score_new (incremental new-vs-corpus near-dup scoring): the
    candidate scan carries a literal bkt_hi PartitionFilter covering
    only the ARRIVING BATCH's mask-reachable high bytes (<= 37 per
    distinct batch high byte — genuine pruning, unlike the full pair
    graph), planted copies are flagged against their sources at
    cosine 1.0, and a batch probing no occupied partition returns an
    empty frame without scanning."""
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        lsh_build,
        lsh_index_dir,
        lsh_score_new,
    )

    idx = lsh_index_dir(SF_DIR)
    lsh_build(_emb(spark, SF_DIR), idx)
    new = (
        _emb(spark, SF_DIR)
        .filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 900000).alias("vec_id"), "embedding")
    )
    df = lsh_score_new(spark, idx, new)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(
        r"PartitionFilters: \[bkt_hi#\d+ (?:INSET|IN \()([0-9, ]+)", plan
    )
    assert m, plan
    assert len(m.group(1).split(",")) <= 3 * 37
    flagged = {
        (r["new_vec"], r["dup_of"])
        for r in df.filter(F.col("cos_sim") == 1.0).collect()
    }
    for i in range(3):
        assert (i + 900000, i) in flagged


def _relabeled_8x_docs(spark, sf_dir):
    """A GENUINE 8x corpus: 8 relabeled copies of documents (distinct
    doc_ids), not the union-in-place fixture — the shingle/gram
    builders order tokens by (doc_id, pos), so duplicated doc_ids
    would pair tokens across copies instead of scaling the corpus."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import _docs

    base = _docs(spark, sf_dir).select("doc_id", "text")
    out = base
    for i in range(1, 8):
        out = out.unionByName(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text"
            )
        )
    return out


def _scan_counts(plan: str) -> dict[str, int]:
    import re

    counts: dict[str, int] = {}
    for path in re.findall(r"file:[^\]\s,]+", plan):
        tail = path.rstrip("/").rsplit("/", 1)[-1]
        counts[tail] = counts.get(tail, 0) + 1
    return counts


@pytest.mark.scale
def test_scale8_score_new_docs_stays_broadcast_single_scan(
    spark, request
):
    """score_new_docs against an 8x shingle index: the membership join
    must keep the SMALL new batch broadcast (no sort-merge shuffle of
    the 8x corpus shingles), each index subdir scanned exactly once,
    no cartesian — and every planted copy still flags its sources at
    jaccard 1.0. Also covers the incremental_near_dup_scoring catalog
    entry's probe stage, which wraps this function."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.streaming.text_ingest import (
        score_new_docs,
        shingle_index_build,
    )

    import shutil
    import tempfile

    corpus = _relabeled_8x_docs(spark, _SF8_BASE)
    # a SHORT index path: explain truncates long locations, and the
    # scan-count assertions parse the path tails out of the plan
    short = tempfile.mkdtemp(dir="/tmp", prefix="sh8-")
    request.addfinalizer(lambda: shutil.rmtree(short, ignore_errors=True))
    shutil.rmtree(short)
    idx = shingle_index_build(corpus, short)
    new = (
        corpus.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 77_000_000).alias("doc_id"), "text")
    )
    # the stop-shingle cap is an ABSOLUTE df knob: an 8x corpus has 8x
    # every df, so the cap must scale with it or recall collapses to
    # zero (measured: median df ~10 at 1x -> ~80 at 8x vs cap 64) — the
    # per-deployment calibration a real scale-up performs
    from realtime_gmall_flink_spark.plans.textops import JACCARD_MAX_DF

    df = score_new_docs(spark, idx, new, max_df=8 * JACCARD_MAX_DF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = _scan_counts(plan)
    assert scans.get("shingles") == 1, scans
    assert scans.get("dfreq") == 1, scans
    assert scans.get("sizes") == 1, scans

    got = {
        (r["new_doc"], r["dup_of"])
        for r in df.filter(F.col("jaccard") == 1.0).collect()
    }
    # each planted copy matches its base doc AND the 7 relabeled copies
    for i in range(5):
        for j in range(8):
            assert (i + 77_000_000, i + j * 10_000_000) in got


@pytest.mark.scale
def test_scale8_score_new_docs_spans_stays_broadcast_single_scan(
    spark, request
):
    """score_new_docs_spans against an 8x gram index: one scan of the
    grams set, membership join broadcast-shaped, no cartesian; a doc
    copied verbatim from the corpus scores fully duplicated
    (dup_pos == n_pos)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.textops import SPAN_K
    from realtime_gmall_flink_spark.streaming.text_ingest import (
        gram_index_build,
        score_new_docs_spans,
    )

    import shutil
    import tempfile

    corpus = _relabeled_8x_docs(spark, _SF8_BASE)
    short = tempfile.mkdtemp(dir="/tmp", prefix="gr8-")
    request.addfinalizer(lambda: shutil.rmtree(short, ignore_errors=True))
    shutil.rmtree(short)
    idx = gram_index_build(corpus, short, k=SPAN_K)
    new = (
        corpus.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 77_000_000).alias("doc_id"), "text")
    )
    df = score_new_docs_spans(spark, idx, new)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = _scan_counts(plan)
    assert scans.get("grams") == 1, scans

    for r in df.collect():
        # verbatim copies: every position's gram exists in the index
        # (docs shorter than k words have no positions and no row)
        assert r["dup_pos"] == r["n_pos"], r


@pytest.mark.scale
def test_scale8_incremental_entry_plan_shape(spark, sf8_dir):
    """The incremental_near_dup_scoring catalog entry at the 8x
    fixture dir: probe stays broadcast-shaped with each index subdir
    scanned once (values are exercised by the relabeled-corpus test
    above; the union-in-place fixture duplicates doc_ids, which is
    fine for plan shape but not for shingle values)."""
    df = catalog()["incremental_near_dup_scoring"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = _scan_counts(plan)
    assert scans.get("shingles") == 1, scans
    assert scans.get("dfreq") == 1, scans
    assert scans.get("sizes") == 1, scans


@pytest.mark.scale
def test_scale8_lsh_score_new_stays_pruned(spark, request):
    """lsh_score_new against an 8x vector corpus (8 relabeled copies,
    each rotated so the copies occupy DIFFERENT buckets): the candidate
    scan must still carry the literal bkt_hi PartitionFilter bounded by
    batch-his x mask fan-out, read the buckets layout exactly once, and
    stay strictly below the occupied-partition count — the probe never
    degenerates to a full buckets scan as the corpus (and its occupied
    bucket space) grows. Covers the probe stage the
    incremental_semantic_scoring entry wraps."""
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        lsh_build,
        lsh_occupied_his,
        lsh_score_new,
    )

    base = _emb(spark, _SF8_BASE).select("vec_id", "embedding", "label")
    out = base
    for i in range(1, 8):
        out = out.unionByName(
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {i + 1}, {64 - i}),"
                    f" slice(embedding, 1, {i}))"
                ).alias("embedding"),
                "label",
            )
        )
    short = tempfile.mkdtemp(dir="/tmp", prefix="lsh8-")
    request.addfinalizer(lambda: shutil.rmtree(short, ignore_errors=True))
    shutil.rmtree(short)
    lsh_build(out, short)

    new = (
        base.filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 900_000).alias("vec_id"), "embedding")
    )
    df = lsh_score_new(spark, short, new)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(
        r"PartitionFilters: \[bkt_hi#\d+ (?:INSET|IN \()([0-9, ]+)", plan
    )
    assert m, plan
    probed = [int(x) for x in m.group(1).split(",")]
    assert len(probed) <= 3 * 37
    # genuine pruning at 8x: strictly fewer partitions than occupied
    occupied = lsh_occupied_his(short)
    assert len(probed) < len(occupied), (len(probed), len(occupied))
    assert "CartesianProduct" not in plan
    scans = _scan_counts(plan)
    assert scans.get("buckets") == 1, scans

    flagged = {
        (r["new_vec"], r["dup_of"])
        for r in df.filter(F.col("cos_sim") == 1.0).collect()
    }
    for i in range(3):
        assert (i + 900_000, i) in flagged


def test_vocab_coverage_single_scan_window_over_classes(spark):
    """The coverage curve must scan documents ONCE: totals ride the
    same class-sized window partitioning as the running sums (a
    separate totals aggregate re-derives the word-count subtree), and
    the only global-order window input is the frequency-CLASS frame,
    never the vocabulary itself (two stacked aggregates sit between
    the scan and the window)."""
    df = catalog()["vocab_coverage_curve"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan
    # word-level and class-level aggregates both present below the window
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial/final


def test_embedding_norm_percentiles_single_scan(spark):
    """Both metric histograms (norm + peak) must come from ONE
    embeddings scan (unpivoted rows, one (m, v) class shuffle) — one
    histogram subtree per metric would scan the corpus per metric,
    and a separate totals aggregate would double it again."""
    df = catalog()["embedding_norm_percentiles"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan


def test_similarity_histogram_rides_single_scan_pairs(spark):
    """The Jaccard band histogram adds one tiny aggregate on top of
    the pair miner's single-scan plan — it must not re-introduce a
    second documents scan or a join."""
    df = catalog()["near_dup_similarity_histogram"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_per_source_cap_one_exchange_window_feeds_agg(spark):
    """The cap report's rank window hash-partitions by source and the
    per-source aggregate reuses that exact partitioning: ONE Exchange
    end-to-end, and the scan reads only the three narrow columns (the
    text column never leaves the parquet footer)."""
    df = catalog()["per_source_doc_cap"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Scan parquet" in plan and plan.count("Scan parquet") == 1
    assert "text#" not in plan


def test_near_dup_source_matrix_text_scanned_once(spark):
    """The provenance matrix decorates the pair graph with sources via
    column-pruned (doc_id, source) lookups — the text column is scanned
    exactly once, inside the pair miner."""
    df = catalog()["near_dup_source_matrix"].builder(spark, SF_DIR)
    plan = _plan(df)
    text_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "text#" in ln
    ]
    assert len(text_scans) == 1
    # the two source-lookup sides are column-pruned two-field scans
    assert plan.count("FileScan parquet [doc_id#") >= 2


@pytest.mark.scale
def test_scale8_pq_probe_shape_constant_and_exact(spark, request):
    """PQ at an 8x corpus: the ADC plan keeps the EXACT operator
    footprint of the 1x plan — same Exchange count (the only exchanges
    are codebook-sized lookup-table reshapes; the codes side stays
    scan -> project -> TakeOrdered with no corpus-sized exchange), same
    two FileScans — and the candidate cut stays PQ_RERANK-bounded, so
    probe cost structure is independent of corpus size. End-to-end: a
    planted exact copy of the query still reranks to cos 1.0 top-1
    through the 8x index."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        PQ_RERANK,
        QUERY_VEC_ID,
        _emb,
        pq_adc_candidates,
        pq_build,
        pq_probe,
    )

    def adc_plan(index_dir, q):
        df = pq_adc_candidates(spark, index_dir, q)
        return df._jdf.queryExecution().executedPlan().toString()

    base = _emb(spark, _SF8_BASE).select("vec_id", "embedding")
    q = base.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    d1 = tempfile.mkdtemp(dir="/tmp", prefix="pq8a-")
    d8 = tempfile.mkdtemp(dir="/tmp", prefix="pq8b-")
    request.addfinalizer(lambda: shutil.rmtree(d1, ignore_errors=True))
    request.addfinalizer(lambda: shutil.rmtree(d8, ignore_errors=True))
    shutil.rmtree(d1)
    shutil.rmtree(d8)

    planted = q.select(
        F.lit(900_000_000).cast("long").alias("vec_id"),
        F.col("qe").alias("embedding"),
    )
    corpus8 = planted
    for i in range(8):
        corpus8 = corpus8.unionByName(
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {i + 1}, {64 - i}),"
                    f" slice(embedding, 1, {i}))"
                ).alias("embedding"),
            )
        )
    pq_build(base, d1)
    pq_build(corpus8, d8)

    p1, p8 = adc_plan(d1, q), adc_plan(d8, q)
    assert p1.count("Exchange") == p8.count("Exchange"), (p1, p8)
    # two scans: codes + codebooks — the query side is an inlined
    # literal, never a scan
    assert p8.count("FileScan parquet") == 2
    assert "TakeOrdered" in p8

    cand8 = pq_adc_candidates(spark, d8, q).collect()
    assert len(cand8) == PQ_RERANK

    top = pq_probe(
        spark, d8, q, corpus8, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert top[0]["vec_id"] == 900_000_000
    assert top[0]["cos_sim"] == 1.0


@pytest.mark.scale
def test_scale8_ivfpq_probe_stays_pruned_codes_scan(spark, tmp_path):
    """The persisted IVF-PQ probe at 8x: the ADC stage still prunes the
    cid-partitioned codes to NPROBE cells with a literal
    PartitionFilter, still reads no embedding column from the codes
    layout, and the candidate cut stays a TakeOrdered — the probe IO
    per candidate row is vec_id + pq_m bytes at any corpus size."""
    import re
    from functools import reduce

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_NPROBE,
        QUERY_VEC_ID,
        _emb,
        ivfpq_adc_candidates,
        ivfpq_build,
    )

    # 8x with DISTINCT ids (the sf8 fixture duplicates ids, which
    # collapses the md5-seeded centroid set — a real 8x corpus grows
    # in rows, not copies of the same key)
    base = _emb(spark, SF_DIR)
    emb = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                "embedding",
            )
            for i in range(8)
        ],
    ).localCheckpoint(eager=True)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpq8"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    from .plan_utils import (
        assert_codes_scans_no_embedding,
        formatted_plan,
        pruned_cids,
    )

    cand = ivfpq_adc_candidates(spark, idx, q, exclude_vec_id=QUERY_VEC_ID)
    plan = formatted_plan(cand)
    # the DEFAULT width on this uncalibrated 8x layout is the
    # fraction-holding adaptive_nprobe of its adaptive cell count —
    # wider than the sandbox constant, still a strict minority scan
    from realtime_gmall_flink_spark.plans.vectors import adaptive_nprobe

    import os

    n_cells = sum(
        1
        for d in os.listdir(os.path.join(idx, "codes"))
        if d.startswith("cid=")
    )
    width = adaptive_nprobe(
        spark.read.parquet(os.path.join(idx, "centroids")).count()
    )
    assert width >= IVF_NPROBE
    assert len(pruned_cids(plan)) == width
    assert_codes_scans_no_embedding(plan)
    assert "TakeOrdered" in cand._jdf.queryExecution().executedPlan().toString()
    # pruned-bytes ratio: the probed cells really are a minority of the
    # 8x layout's cell partitions
    assert n_cells > width
    assert len(cand.collect()) > 0
    # an EXPLICIT width still wins over every default
    pinned = ivfpq_adc_candidates(
        spark, idx, q, exclude_vec_id=QUERY_VEC_ID, nprobe=IVF_NPROBE
    )
    assert len(pruned_cids(formatted_plan(pinned))) == IVF_NPROBE


@pytest.mark.scale
def test_scale8_sequence_packing_one_shard_exchange_holds(spark, sf8_dir):
    """Packing at 8x: still no global sort (range exchange), no
    cartesian, shard-sized output — the shard-bucket window is the only
    corpus-wide exchange whatever the corpus size."""
    df = catalog()["sequence_packing_stats"].builder(spark, sf8_dir)
    plan = _plan(df)
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    from realtime_gmall_flink_spark.plans.textops import PACK_BUCKETS

    assert df.count() <= PACK_BUCKETS


@pytest.mark.scale
def test_scale8_materialized_mixture_two_cheap_scans(spark, sf8_dir):
    """The mixture materialization at 8x: language-sized output, no
    cartesian, and the factor-table pass reads ONLY the lang column
    (column pruning keeps pass 1 metadata-cheap — the text column is
    read exactly once, in the per-doc pass)."""
    import re

    from .plan_utils import formatted_plan

    df = catalog()["materialized_mixture_stats"].builder(spark, sf8_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    doc_schemas = [
        re.search(r"ReadSchema: (\S+)", c).group(1)
        for c in plan.split("Scan parquet")
        if "documents.parquet" in c and "ReadSchema" in c
    ]
    assert len(doc_schemas) == 2
    assert sum("text" in s for s in doc_schemas) == 1  # text read once
    assert any(s == "struct<lang:string>" for s in doc_schemas), doc_schemas
    assert df.count() <= 16  # language-sized output regardless of 8x


@pytest.mark.scale
def test_scale8_sdc_geometry_keeps_pair_volume_linear(spark, tmp_path):
    """The r10 weak-mark closure, measured: at sdc_nlist_for geometry
    the cell COUNT scales with the corpus, so the miner's total
    within-cell pair volume grows ~linearly with an 8x corpus — while
    the old fixed-nlist default grows it ~64x (quadratic). Volumes come
    from assignment footer counts (the same per-cell counts the
    sdc_pair_mine guard reads), no mining job needed."""
    from functools import reduce

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivf_build,
        sdc_nlist_for,
    )

    def pair_volume(emb, where, nlist):
        idx = ivf_build(emb, str(tmp_path / where), n_centroids=nlist)
        counts = [
            r["count"]
            for r in spark.read.parquet(f"{idx}/assignment")
            .groupBy("cid")
            .count()
            .collect()
        ]
        return sum(c * (c - 1) // 2 for c in counts), len(counts)

    # a small bound so the adaptive sizing is exercised at test scale
    bound = 450
    base = _emb(spark, SF_DIR).localCheckpoint(eager=True)
    n1 = base.count()
    emb8 = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x + F.lit(float(i)) * 0.001 * (j + 1),
                ).alias("embedding"),
            )
            for i in range(8)
        ],
    ).localCheckpoint(eager=True)
    n8 = emb8.count()
    assert n8 == 8 * n1
    v1, cells1 = pair_volume(base, "sdc1", sdc_nlist_for(n1, bound))
    v8, cells8 = pair_volume(emb8, "sdc8", sdc_nlist_for(n8, bound))
    assert cells8 >= 5 * cells1  # cells really scale with n
    # ~linear pair volume: generous 3x skew slack over the 8x corpus
    # ratio, and decisively below the fixed-nlist quadratic 64x
    assert v8 <= 24 * v1, (v1, v8, cells1, cells8)
    # the fixed-geometry counterfactual really is quadratic-order
    vq, _ = pair_volume(emb8, "sdcq", sdc_nlist_for(n1, bound))
    assert vq >= 40 * v1, (v1, vq)


@pytest.mark.scale
def test_scale8_knn_graph_volume_linear_no_cartesian(spark, tmp_path):
    """The kNN graph at 8x: no CartesianProduct (the pair space is the
    cid equi-join), output bounded at k rows per vector regardless of
    corpus growth, and the within-cell pair volume the job walks stays
    ~linear when the layout is mining-geared (sdc_nlist_for) — the
    oversized-cell refusal guards the ANN-geared worst case."""
    from functools import reduce

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        KNN_GRAPH_K,
        _emb,
        ivf_build,
        ivf_knn_graph,
        sdc_nlist_for,
    )

    base = _emb(spark, SF_DIR).localCheckpoint(eager=True)
    emb8 = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x + F.lit(float(i)) * 0.001 * (j + 1),
                ).alias("embedding"),
            )
            for i in range(8)
        ],
    ).localCheckpoint(eager=True)
    n8 = emb8.count()
    idx = ivf_build(
        emb8,
        str(tmp_path / "knn8"),
        n_centroids=sdc_nlist_for(n8, 450),
    )
    g = ivf_knn_graph(spark, idx)
    plan = _plan(g)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = g.count()
    assert 0 < rows <= KNN_GRAPH_K * n8
    # per-vector bound holds exactly (k per vector with enough mates)
    over = (
        g.groupBy("vec_id")
        .count()
        .filter(F.col("count") > KNN_GRAPH_K)
        .count()
    )
    assert over == 0


@pytest.mark.scale
def test_scale8_knn_graph_spill_and_rerank_bounded(spark, tmp_path):
    """The two r13 graph refinements keep the scale contract at 8x:
    the spilled (boundary-repair) graph and the exact-reranked graph
    both stay equi-join-shaped (no cartesian, no nested-loop), their
    output stays bounded at k rows per vector regardless of corpus
    growth, and the spilled pair space stays within its ~spill^2
    envelope of the cell-scoped one (the refusal gates the rest)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        KNN_GRAPH_K,
        KNN_SPILL,
        _emb,
        ivf_build,
        ivf_knn_graph,
        ivfpq_build,
        ivfpq_knn_graph_exact,
        sdc_nlist_for,
    )

    base = _emb(spark, SF_DIR).localCheckpoint(eager=True)
    emb8 = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x + F.lit(float(i)) * 0.001 * (j + 1),
                ).alias("embedding"),
                "label",
            )
            for i in range(8)
        ],
    ).localCheckpoint(eager=True)
    n8 = emb8.count()
    nlist = sdc_nlist_for(n8, 450)
    ivf_dir = str(tmp_path / "sp8-ivf")
    ivf_build(emb8, ivf_dir, n_centroids=nlist)
    g = ivf_knn_graph(spark, ivf_dir, spill=KNN_SPILL)
    plan = _plan(g)
    assert "CartesianProduct" not in plan
    # the one-row broadcast centroid-array attach of _ivf_spill_assign
    # (the ivf_assign shape) runs ONCE behind the membership
    # checkpoint — the visible plan must hold no nested loop at all
    assert "BroadcastNestedLoopJoin" not in plan
    rows = g.count()
    assert 0 < rows <= KNN_GRAPH_K * n8
    over = (
        g.groupBy("vec_id")
        .count()
        .filter(F.col("count") > KNN_GRAPH_K)
        .count()
    )
    assert over == 0
    idx = ivfpq_build(
        emb8,
        str(tmp_path / "sp8-ivfpq"),
        ivf_dir=ivf_dir,
        pq_dir=str(tmp_path / "sp8-pq"),
    )
    r = ivfpq_knn_graph_exact(spark, idx, emb8)
    plan = _plan(r)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rrows = r.count()
    assert 0 < rrows <= KNN_GRAPH_K * n8


def test_training_shard_frame_one_exchange_local_sort(spark):
    """The shard materialization plan: exactly ONE Exchange (the
    shard-id repartition) and only task-local sorts — a global sort
    here would serialize the corpus through one ordering at 100 TB."""
    from realtime_gmall_flink_spark.plans.textops import (
        training_shard_frame,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    plan = _plan(training_shard_frame(docs))
    assert plan.count("Exchange") == 1
    # every Sort node is task-local (global=false); a global sort
    # would appear as Sort [..], true, ..  plus a range Exchange
    import re

    for m in re.finditer(r"Sort \[[^\]]*\], (\w+),", plan):
        assert m.group(1) == "false", plan
