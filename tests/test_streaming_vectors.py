"""Streaming embedding ingest parity: score-on-arrival (cell assignment
+ LSH fingerprint against the persisted IVF index) over a file stream
must equal the batch computation row-for-row, across a checkpointed
restart, and the foreachBatch near-dup check must flag planted copies
against the indexed corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.functions.similarity import (
    cosine_similarity,
)
from realtime_gmall_flink_spark.plans.vectors import (
    COSINE_DUP_THRESHOLD,
    ivf_build,
)
from realtime_gmall_flink_spark.sources.testdata import load_table
from realtime_gmall_flink_spark.streaming import vector_ingest as VI

SF_DIR = "/root/testdata/sf0.001"


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    )


def _arrivals(spark, base_ids, offset):
    """Exact copies of indexed vectors under new ids — guaranteed
    cosine 1.0 near-dups that must land in their source's cell."""
    emb = load_table(spark, SF_DIR, "embeddings")
    return (
        emb.filter(F.col("vec_id").isin(base_ids))
        .select(
            (F.col("vec_id") + offset).alias("vec_id"),
            "embedding",
        )
    )


def test_embedding_ingest_matches_batch_with_restart(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    part1 = list(range(10))
    part2 = list(range(10, 15))
    _arrivals(spark, part1, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, idx, out, ckpt).awaitTermination()

    # restart with more arrivals on the same checkpoint
    _arrivals(spark, part2, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, idx, out, ckpt).awaitTermination()

    cent = spark.read.parquet(os.path.join(idx, "centroids"))
    base = spark.read.parquet(os.path.join(idx, "assignment"))
    all_arrivals = _arrivals(spark, part1 + part2, 100000)

    # scored parity: streaming result == batch scoring of all arrivals
    got = VI.read_scored(spark, out)
    expected = VI.score_embedding_stream(all_arrivals, cent)
    assert _rowset(got) == _rowset(expected)
    # restart added part2 exactly once — no replays, no loss
    assert got.count() == len(part1) + len(part2)

    # a copy must land in its source vector's cell
    src_cells = {
        r["vec_id"]: r["cid"]
        for r in base.filter(
            F.col("vec_id").isin(part1 + part2)
        ).collect()
    }
    for r in got.collect():
        assert r["cid"] == src_cells[r["vec_id"] - 100000], r["vec_id"]

    # near-dup parity: streaming side output == the same-cell batch join
    dups = VI.read_near_dups(spark, out)
    assert dups is not None
    cos = cosine_similarity(F.col("n.embedding"), F.col("b.embedding"))
    scored_b = VI.score_embedding_stream(all_arrivals, cent)
    expected_dups = (
        scored_b.alias("n")
        .join(base.alias("b"), F.col("n.cid") == F.col("b.cid"))
        .filter(F.col("n.vec_id") != F.col("b.vec_id"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("n.vec_id").alias("new_vec"),
            F.col("b.vec_id").alias("dup_of"),
            F.round("__cos", 6).alias("cos_sim"),
        )
    )
    assert _rowset(dups) == _rowset(expected_dups)
    # every planted copy is flagged against its source at cosine 1.0
    flagged = {
        (r["new_vec"], r["dup_of"])
        for r in dups.filter(F.col("cos_sim") == 1.0).collect()
    }
    for i in part1 + part2:
        assert (i + 100000, i) in flagged


def test_append_scored_to_index_idempotent_and_probeable(spark, tmp_path):
    """ingest -> append_scored_to_index -> ivf_probe closes the
    build-once/append-many loop: ingested copies become probeable
    through the pruned scan at cosine 1.0, the append is idempotent
    (second run appends zero), and appended cids equal the batch
    assignment's (an index rebuild would agree cell-for-cell)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivf_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    base_ids = [0, 1, 2]
    _arrivals(spark, base_ids, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, idx, out, ckpt).awaitTermination()

    n = VI.append_scored_to_index(spark, idx, out)
    assert n == len(base_ids)
    assert VI.append_scored_to_index(spark, idx, out) == 0  # idempotent

    # the appended copy of vec 0 is now probeable at cosine 1.0
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    top = {r["vec_id"]: r["cos_sim"]
           for r in ivf_probe(spark, idx, q, exclude_vec_id=0).collect()}
    assert top.get(100000) == 1.0

    # appended cids match what a batch assignment (== rebuild) gives
    cent = spark.read.parquet(f"{idx}/centroids")
    want = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(
            _arrivals(spark, base_ids, 100000), cent
        ).collect()
    }
    got = {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(f"{idx}/assignment")
        .filter(F.col("vec_id") >= 100000)
        .collect()
    }
    assert got == want


def test_append_scored_dedups_across_batches(spark, tmp_path):
    """The same vec_id arriving in TWO micro-batches (at-least-once
    producer) before any maintenance run must be appended exactly once
    — the scored/ tree holds it twice, the assignment must not."""
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two ingest runs deliver the SAME new vec_id in separate batches
    _arrivals(spark, [0], 600000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, idx, out, ckpt).awaitTermination()
    _arrivals(spark, [0], 600000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, idx, out, ckpt).awaitTermination()
    dup_rows = (
        VI.read_scored(spark, out)
        .filter(F.col("vec_id") == 600000)
        .count()
    )
    assert dup_rows == 2  # precondition: it really is in two batches
    assert VI.append_scored_to_index(spark, idx, out) == 1
    assert (
        spark.read.parquet(f"{idx}/assignment")
        .filter(F.col("vec_id") == 600000)
        .count()
        == 1
    )


def test_append_scored_to_sq8_idempotent_and_probeable(spark, tmp_path):
    """The SQ8 twin of the IVF maintenance step: one ingest run's
    scored rows fold into the compact-codes layout idempotently, and
    an ingested copy probes back on top at quantized-self fidelity."""
    from realtime_gmall_flink_spark.plans.vectors import (
        sq8_build,
        sq8_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    sq8 = sq8_build(emb, str(tmp_path / "sq8"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    base_ids = [0, 1, 2]
    _arrivals(spark, base_ids, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()

    n = VI.append_scored_to_sq8(spark, sq8, out)
    assert n == len(base_ids)
    assert VI.append_scored_to_sq8(spark, sq8, out) == 0  # idempotent

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    top = sq8_probe(spark, sq8, q, exclude_vec_id=0).collect()
    assert top[0]["vec_id"] == 100000
    assert top[0]["cos_sim"] >= 0.999


def test_append_scored_to_pq_idempotent_and_probeable(spark, tmp_path):
    """The PQ twin of the maintenance step: one ingest run's scored
    rows encode into the persisted codes idempotently, and an ingested
    exact copy ADC-ranks into the candidates and exact-reranks to
    cosine 1.0 (the rerank corpus = build corpus + arrivals)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        pq_build,
        pq_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    pq = pq_build(emb, str(tmp_path / "pq"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    base_ids = [0, 1, 2]
    _arrivals(spark, base_ids, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()

    # screen=False: this test exercises the RAW append mechanics —
    # the arrivals are exact copies, which the default screen drops
    n = VI.append_scored_to_pq(spark, pq, out, screen=False)
    assert n == len(base_ids)
    assert (
        VI.append_scored_to_pq(spark, pq, out, screen=False) == 0
    )  # idempotent

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.select("vec_id", "embedding").unionByName(
        _arrivals(spark, base_ids, 100000)
    )
    top = pq_probe(spark, pq, q, corpus, exclude_vec_id=0).collect()
    assert top[0]["vec_id"] == 100000
    assert top[0]["cos_sim"] == 1.0  # exact rerank, exact copy


def test_append_scored_to_ivfpq_idempotent_and_probeable(spark, tmp_path):
    """The composed-layout twin: arrivals land in the cid partition a
    rebuild would give them (cell parity vs the batch assignment) and
    probe back at cosine 1.0 through the pruned codes-only scan."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivfpq_build,
        ivfpq_probe,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    ivfpq = ivfpq_build(emb, str(tmp_path / "ivfpq"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    base_ids = [0, 1, 2]
    _arrivals(spark, base_ids, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()

    # screen=False: raw append mechanics under test (see pq twin)
    n = VI.append_scored_to_ivfpq(spark, ivfpq, out, screen=False)
    assert n == len(base_ids)
    assert (
        VI.append_scored_to_ivfpq(spark, ivfpq, out, screen=False) == 0
    )  # idempotent

    # appended cids match the batch assignment (rebuild-equivalent)
    cent = spark.read.parquet(f"{ivfpq}/centroids")
    want = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(
            _arrivals(spark, base_ids, 100000), cent
        ).collect()
    }
    got = {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(f"{ivfpq}/codes")
        .filter(F.col("vec_id") >= 100000)
        .collect()
    }
    assert got == want

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.select("vec_id", "embedding").unionByName(
        _arrivals(spark, base_ids, 100000)
    )
    top = ivfpq_probe(spark, ivfpq, q, corpus, exclude_vec_id=0).collect()
    assert top[0]["vec_id"] == 100000
    assert top[0]["cos_sim"] == 1.0


def test_pq_adc_screening_flags_planted_copies_codes_only(spark, tmp_path):
    """The ADC near-dup screen: planted exact copies of indexed
    vectors flag their source as the TOP (minimum-adc) candidate via
    ONE codes scan — the plan reads no embedding column from the index
    (the float corpus appears only as the arrivals side), and an
    unrelated far vector screens clean."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        pq_adc_near_dups,
        pq_build,
    )

    from tests.plan_utils import (
        assert_codes_scans_no_embedding,
        formatted_plan,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    pq = pq_build(emb, str(tmp_path / "pq"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")
    base_ids = [0, 1, 2]
    _arrivals(spark, base_ids, 100000).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()

    dups = VI.screen_scored_against_pq(spark, pq, out)
    plan = formatted_plan(dups)
    assert_codes_scans_no_embedding(plan)
    assert plan.count("pq/codes") == 1  # one codes scan for the batch
    top = {}
    for r in dups.collect():
        cur = top.get(r["new_vec"])
        if cur is None or (r["adc"], r["dup_of"]) < cur:
            top[r["new_vec"]] = (r["adc"], r["dup_of"])
    for i in base_ids:
        assert top[i + 100000][1] == i, top  # source = min-adc candidate

    # a vector far from everything screens clean: alternating +/-1
    # pattern vs the near-random corpus
    far = spark.createDataFrame(
        [(999_999, [float(1 if i % 2 else -1) for i in range(64)])],
        "vec_id long, embedding array<float>",
    )
    clean = pq_adc_near_dups(spark, pq, far)
    assert clean.count() == 0


def test_sdc_score_new_incremental_screen_and_default_append(
    spark, tmp_path
):
    """The incremental dedup-by-embedding story end to end:
    (a) sdc_score_new flags exact copies of indexed vectors at
    sdc_micro == 0 via a cid-pruned codes-vs-codes scan (no float read
    of the corpus), novel vectors screen clean, and the pair volume
    guard refuses an oversized (new x indexed) product by name;
    (b) append_scored_to_ivfpq's DEFAULT screen keeps those copies out
    of the index while novel arrivals still land."""
    import pytest as _pytest

    from realtime_gmall_flink_spark.plans.vectors import (
        ivfpq_build,
        sdc_score_new,
    )

    from tests.plan_utils import (
        assert_codes_scans_no_embedding,
        formatted_plan,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    ivfpq = ivfpq_build(emb, str(tmp_path / "ivfpq"))

    # (a) batch form: copies flag their source at 0, codes-only plan
    copies = _arrivals(spark, [0, 1, 2], 100000)
    flagged = sdc_score_new(spark, ivfpq, copies)
    plan = formatted_plan(flagged)
    assert_codes_scans_no_embedding(plan)
    got = {
        (r["new_vec"], r["dup_of"]): r["sdc_micro"]
        for r in flagged.collect()
    }
    assert got == {(100000, 0): 0, (100001, 1): 0, (100002, 2): 0}
    novel = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    assert sdc_score_new(spark, ivfpq, novel).count() == 0
    with _pytest.raises(ValueError, match="undersized for incremental"):
        sdc_score_new(spark, ivfpq, copies, max_cell_pairs=1)

    # (b) the default append screen: copies dropped, novels land
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")
    _arrivals(spark, [0, 1, 2], 100000).unionByName(novel).write.mode(
        "append"
    ).parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()
    assert VI.append_scored_to_ivfpq(spark, ivfpq, out) == novel.count()
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{ivfpq}/codes")
        .filter(F.col("vec_id") >= 100000)
        .collect()
    }
    assert ids == {200000, 200001, 200002}  # copies never indexed
    # replay: idempotent under the default screen too
    assert VI.append_scored_to_ivfpq(spark, ivfpq, out) == 0


def test_pq_adc_calibrate_and_default_pq_screen(spark, tmp_path):
    """pq_adc_calibrate measures the index's OWN residual floor and
    background (separated on this fixture — the module default
    threshold sits inside the measured band), and
    append_scored_to_pq's default screen drops exact copies while
    letting novel arrivals through."""
    from realtime_gmall_flink_spark.plans.vectors import (
        PQ_DUP_ADC_MICRO,
        pq_adc_calibrate,
        pq_build,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    pq = pq_build(emb, str(tmp_path / "pq"))
    cal = pq_adc_calibrate(spark, pq, emb)
    assert cal["separated"], cal
    assert cal["residual_floor"] < cal["suggested"] < cal["background"]
    # the module default is usable for THIS geometry: above the floor
    # (copies screen positive), below the background (novel rows pass)
    assert cal["residual_floor"] < PQ_DUP_ADC_MICRO < cal["background"]

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")
    novel = emb.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    _arrivals(spark, [0, 1, 2], 100000).unionByName(novel).write.mode(
        "append"
    ).parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()
    assert VI.append_scored_to_pq(spark, pq, out) == novel.count()
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{pq}/codes")
        .filter(F.col("vec_id") >= 100000)
        .collect()
    }
    assert ids == {200000, 200001}
    assert VI.append_scored_to_pq(spark, pq, out) == 0  # replay


def test_exact_copy_of_appended_row_never_reindexed(spark, tmp_path):
    """The exact-copy guarantee the screens alone cannot give: a new
    arrival byte-identical to a PREVIOUSLY APPENDED ingest row is
    dropped deterministically even when the threshold screen is
    tightened below the quantization residual floor (max_adc=0 /
    max_sdc=-1 flag nothing), and regardless of id order (the copy's
    id sorts BELOW the indexed row's). Intra-run identical pairs
    collapse to one appended survivor."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivfpq_build,
        pq_build,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = ivf_build(emb, str(tmp_path / "ivf"))
    pq = pq_build(emb, str(tmp_path / "pq"))
    ivfpq = ivfpq_build(emb, str(tmp_path / "ivfpq"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: one NOVEL arrival (id 500500) + an intra-run identical
    # pair (600000/600001 share one embedding) — 2 rows land
    novel = emb.filter(F.col("vec_id") == 7).select(
        F.lit(500500).cast("long").alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    pair = emb.filter(F.col("vec_id") == 9).select(
        F.lit(600000).cast("long").alias("vec_id"),
        F.sort_array("embedding").alias("embedding"),
    )
    pair = pair.unionByName(
        pair.select(
            F.lit(600001).cast("long").alias("vec_id"), "embedding"
        )
    )
    novel.unionByName(pair).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()
    assert VI.append_scored_to_pq(spark, pq, out, max_adc=0) == 2
    assert VI.append_scored_to_ivfpq(spark, ivfpq, out, max_sdc=-1) == 2
    for idx in (pq, ivfpq):
        ids = {
            r["vec_id"]
            for r in spark.read.parquet(f"{idx}/codes")
            .filter(F.col("vec_id") >= 500000)
            .collect()
        }
        assert ids == {500500, 600000}  # min-id intra-run survivor

    # run 2: byte-identical copies of the run-1 arrivals under SMALLER
    # ids — a min-id collapse would keep these; the vs-indexed exact
    # drop must remove them with the screens disabled-by-threshold
    copies = novel.select(
        F.lit(400400).cast("long").alias("vec_id"), "embedding"
    ).unionByName(
        pair.limit(1).select(
            F.lit(400401).cast("long").alias("vec_id"), "embedding"
        )
    )
    copies.write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()
    assert VI.append_scored_to_pq(spark, pq, out, max_adc=0) == 0
    assert VI.append_scored_to_ivfpq(spark, ivfpq, out, max_sdc=-1) == 0
    for idx in (pq, ivfpq):
        assert (
            spark.read.parquet(f"{idx}/codes")
            .filter(F.col("vec_id").isin(400400, 400401))
            .count()
            == 0
        )
    # the drops were RECORDED (sticky decisions): the copies' ids sit
    # in the decided logs, so a third run resolves them on the skinny
    # id probe instead of re-paying the embedding collapse/screen
    import os

    for d in ("screened_pq", "screened_ivfpq"):
        assert os.path.isdir(os.path.join(out, d))
        got = {
            r["vec_id"]
            for r in spark.read.parquet(os.path.join(out, d)).collect()
        }
        assert {400400, 400401} <= got
    assert VI.append_scored_to_pq(spark, pq, out, max_adc=0) == 0
    assert VI.append_scored_to_ivfpq(spark, ivfpq, out, max_sdc=-1) == 0


def test_append_knn_side_output_lifecycle(spark, tmp_path):
    """The streaming leg of the kNN graph: append_scored_to_ivfpq
    (knn_out=...) persists each APPENDED arrival's neighbor list,
    computed against the PRE-append index — (a) lists equal a direct
    sdc_knn_new over the same pre-append layout; (b) screened-out
    near-duplicates get NO list (they never enter the corpus); (c) a
    replayed run appends nothing new to knn_out (anti-join
    idempotency); (d) the raw screen=False path writes lists too and
    never self-matches an id the index already holds."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivfpq_build,
        sdc_knn_new,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = ivf_build(emb, str(tmp_path / "kivf"))
    ivfpq = ivfpq_build(emb, str(tmp_path / "kivfpq"))

    copies = _arrivals(spark, [0, 1, 2], 100000)
    novel = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")
    copies.unionByName(novel).write.mode("append").parquet(src)
    VI.run_embedding_ingest(spark, src, ivf, out, ckpt).awaitTermination()

    # expected lists: computed against the index BEFORE any append
    expected = _rowset(sdc_knn_new(spark, ivfpq, novel))
    knn_out = str(tmp_path / "knn_lists")
    assert (
        VI.append_scored_to_ivfpq(spark, ivfpq, out, knn_out=knn_out)
        == novel.count()
    )
    written = spark.read.parquet(knn_out)
    # (a) exact agreement with the direct incremental form
    assert _rowset(written) == expected
    # (b) screened copies have no list
    assert (
        written.filter(F.col("new_vec") < 200000).count() == 0
    )
    # (c) replay: no new lists, no new rows
    assert (
        VI.append_scored_to_ivfpq(spark, ivfpq, out, knn_out=knn_out)
        == 0
    )
    assert _rowset(spark.read.parquet(knn_out)) == expected

    # (d) raw path on a second batch: lists land for the new ids only,
    # ids already indexed are never self-matched, and a DUPLICATED id
    # in the at-least-once scored history (written twice below) does
    # not trip the encode's duplicate-qid guard
    more = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).select(
        (F.col("vec_id") + 300000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    src2 = str(tmp_path / "arrivals2")
    out2 = str(tmp_path / "ingest_out2")
    more.write.mode("append").parquet(src2)
    more.limit(1).write.mode("append").parquet(src2)
    VI.run_embedding_ingest(
        spark, src2, ivf, out2, str(tmp_path / "ckpt2")
    ).awaitTermination()
    expected2 = _rowset(sdc_knn_new(spark, ivfpq, more))
    assert (
        VI.append_scored_to_ivfpq(
            spark, ivfpq, out2, screen=False, knn_out=knn_out
        )
        == more.count()
    )
    got = spark.read.parquet(knn_out)
    assert _rowset(got.filter(F.col("new_vec") >= 300000)) == expected2
    # no self-matches anywhere (an arrival never lists itself)
    assert got.filter(F.col("new_vec") == F.col("nb_id")).count() == 0
    # earlier lists untouched
    assert _rowset(got.filter(F.col("new_vec") < 300000)) == expected


def test_fold_knn_side_output_into_persisted_graph(spark, tmp_path):
    """The streaming side output and the persisted graph compose: the
    ingest writes arrival lists to knn_out inside its own crash
    window; fold_knn_lists_into_graph makes them queryable with the
    bulk graph (schema-aligned, vertex anti-join), and a replayed
    fold appends nothing."""
    from realtime_gmall_flink_spark.plans.vectors import (
        fold_knn_lists_into_graph,
        ivfpq_build,
        knn_graph_build,
        read_knn_graph,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = ivf_build(emb, str(tmp_path / "fivf"))
    ivfpq = ivfpq_build(emb, str(tmp_path / "fivfpq"))
    gdir = str(tmp_path / "fgraph")
    knn_graph_build(spark, ivfpq, gdir)
    bulk_n = read_knn_graph(spark, gdir).count()

    novel = emb.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    src = str(tmp_path / "farrivals")
    out = str(tmp_path / "fout")
    novel.write.mode("append").parquet(src)
    VI.run_embedding_ingest(
        spark, src, ivf, out, str(tmp_path / "fckpt")
    ).awaitTermination()
    knn_out = str(tmp_path / "fknn")
    appended = VI.append_scored_to_ivfpq(
        spark, ivfpq, out, knn_out=knn_out
    )
    assert appended == novel.count()

    n = fold_knn_lists_into_graph(spark, knn_out, gdir)
    side_rows = spark.read.parquet(knn_out).count()
    assert n == side_rows > 0
    g = read_knn_graph(spark, gdir)
    assert g.count() == bulk_n + n
    assert (
        g.filter(F.col("vec_id") >= 500000)
        .select("vec_id")
        .distinct()
        .count()
        == novel.count()
    )
    # replayed fold: nothing new
    assert fold_knn_lists_into_graph(spark, knn_out, gdir) == 0
    assert read_knn_graph(spark, gdir).count() == bulk_n + n


def test_fold_refuses_wider_graph(spark, tmp_path):
    """The side output is cut at KNN_GRAPH_K; folding it into a graph
    persisted with a larger k would silently truncate appended
    vertices' lists — refused by name, remedy knn_graph_append_new."""
    import pytest as _pytest

    from realtime_gmall_flink_spark.plans.vectors import (
        KNN_GRAPH_K,
        fold_knn_lists_into_graph,
        ivfpq_build,
        knn_graph_build,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    ivfpq = ivfpq_build(emb, str(tmp_path / "wivfpq"))
    gdir = str(tmp_path / "wgraph")
    knn_graph_build(spark, ivfpq, gdir, k=KNN_GRAPH_K + 2)
    side = str(tmp_path / "wside")
    spark.createDataFrame(
        [(900001, 1, 100, 1)], "new_vec long, nb_id long,"
        " sdc_micro long, rk int"
    ).write.parquet(side)
    with _pytest.raises(ValueError, match="knn_graph_append_new"):
        fold_knn_lists_into_graph(spark, side, gdir)
