"""The r12 weak-mark closure: a HARD driver-side budget for the
validated-snapshot rerank (ADC_RERANK_MAX).

The defect class (r12 VERDICT): the pool-proportional rerank default
composed with the fraction-holding nprobe fallback makes an
all-default (uncalibrated) IVF-PQ layout's candidate budget ~n/16 with
no ceiling — and the driver path collects those ids, pushes them back
as isin literals, and round-trips them through createDataFrame. The
closure: at or below ADC_RERANK_MAX the driver-snapshot path is
byte-identical to the pinned oracles; ABOVE it the exact rerank stays
DISTRIBUTED (_pq_distributed_rerank / _pq_distributed_rerank_batch) —
same candidate set, same exact-cosine ordering, same
missing/NULL/conflict refusals (as aggregate checks over a
localCheckpoint snapshot), nothing candidate-shaped on the driver.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import realtime_gmall_flink_spark.plans.vectors as V

from .conftest import SF_DIR
from .test_nprobe_calibration import _emb8, _exact_topk


def _q(emb, qid):
    return emb.filter(F.col("vec_id") == qid).select(
        F.col("embedding").alias("qe")
    )


def _spy_fetch(monkeypatch):
    """Record every driver-materialized candidate-id count."""
    seen: list[int] = []
    orig = V._pq_fetch_validated

    def spy(spark, emb, ids, caller):
        seen.append(len(ids))
        return orig(spark, emb, ids, caller)

    monkeypatch.setattr(V, "_pq_fetch_validated", spy)
    return seen


def _forbid_fetch(monkeypatch):
    def boom(spark, emb, ids, caller):  # pragma: no cover - must not run
        raise AssertionError(
            f"{caller}: driver-side candidate fetch ran above the cap"
            f" ({len(ids)} ids)"
        )

    monkeypatch.setattr(V, "_pq_fetch_validated", boom)


@pytest.mark.scale
def test_all_default_probe_driver_budget_capped_at_8x(
    spark, tmp_path, monkeypatch
):
    """THE done-criterion: an 8x ALL-DEFAULT layout (adaptive nlist,
    fraction-holding nprobe fallback, pool-proportional rerank — no
    pins, no calibration) never materializes more than ADC_RERANK_MAX
    candidate ids on the driver, while recall@10 holds the 0.8 gate the
    family pins. On this corpus the adaptive budget resolves below the
    cap so the driver path runs — the spy pins its size; the dispatch
    above the cap is exercised by the tests below."""
    emb8 = _emb8(spark)
    idx = V.ivfpq_build(emb8, str(tmp_path / "ivfpq8"))  # all defaults
    seen = _spy_fetch(monkeypatch)
    got, want = 0, 0
    for qid in (0, 10_000_001, 70_000_002):
        exact = _exact_topk(emb8, qid, V.TOP_K)
        probed = {
            r["vec_id"]
            for r in V.ivfpq_probe(
                spark, idx, _q(emb8, qid), emb8, exclude_vec_id=qid
            ).collect()
        }
        got += len(exact & probed)
        want += len(exact)
    assert want > 0
    assert got / want >= 0.8, (got, want)
    assert seen and all(n <= V.ADC_RERANK_MAX for n in seen), seen
    # the adaptive budget really was pool-proportional (not the floor):
    # the all-default width must exceed the fixture constant here
    _, width, _ = V._ivfpq_adc_candidates(spark, idx, _q(emb8, 0))
    assert V.PQ_RERANK < width <= V.ADC_RERANK_MAX


@pytest.mark.scale
def test_oversized_budget_stays_distributed_and_equal(
    spark, tmp_path, monkeypatch
):
    """Above the cap the probe dispatches to the distributed tail: the
    driver fetch NEVER runs (monkeypatched to raise), and the result is
    row-identical to the driver path at the same explicit rerank — the
    cap changes WHERE the rerank runs, never what it returns."""
    emb8 = _emb8(spark)
    idx = V.ivfpq_build(emb8, str(tmp_path / "ivfpq8d"))
    qid = 10_000_001
    q = _q(emb8, qid)
    _, width, _ = V._ivfpq_adc_candidates(spark, idx, q, exclude_vec_id=qid)
    assert width > 128  # the monkeypatched cap below really is exceeded
    via_driver = [
        tuple(r)
        for r in V.ivfpq_probe(
            spark, idx, q, emb8, exclude_vec_id=qid, rerank=width
        ).collect()
    ]
    monkeypatch.setattr(V, "ADC_RERANK_MAX", 128)
    _forbid_fetch(monkeypatch)
    via_dist = [
        tuple(r)
        for r in V.ivfpq_probe(
            spark, idx, q, emb8, exclude_vec_id=qid
        ).collect()
    ]
    assert via_dist == via_driver
    # the duplicate-id build+appends shape stays tolerated distributed
    doubled = emb8.select("vec_id", "embedding").unionByName(
        emb8.select("vec_id", "embedding")
    )
    via_dup = [
        tuple(r)
        for r in V.ivfpq_probe(
            spark, idx, q, doubled, exclude_vec_id=qid
        ).collect()
    ]
    assert via_dup == via_driver


@pytest.mark.scale
def test_distributed_refusals_match_driver_classes(
    spark, tmp_path, monkeypatch
):
    """The aggregate-check refusals above the cap name the SAME three
    corpus-consistency classes the driver path names — a partial,
    NULL-carrying, or conflicting rerank corpus can never silently
    shrink or skew the top-k on either path."""
    emb = V._emb(spark, SF_DIR)
    idx = V.pq_build(emb, str(tmp_path / "pqd"))
    q = _q(emb, V.QUERY_VEC_ID)
    monkeypatch.setattr(V, "ADC_RERANK_MAX", 32)
    _forbid_fetch(monkeypatch)

    def run(corpus):
        return V.pq_probe(
            spark,
            idx,
            q,
            corpus,
            exclude_vec_id=V.QUERY_VEC_ID,
            rerank=V.PQ_RERANK,  # 64 > the monkeypatched cap
        ).collect()

    partial = emb.filter(F.col("vec_id") % 2 == 0)
    with pytest.raises(ValueError, match="missing from the rerank corpus"):
        run(partial)
    nulled = emb.select("vec_id", "embedding").unionByName(
        emb.select(
            "vec_id", F.lit(None).cast("array<float>").alias("embedding")
        )
    )
    with pytest.raises(ValueError, match="NULL embeddings"):
        run(nulled)
    conflict = emb.select("vec_id", "embedding").unionByName(
        emb.select("vec_id", F.reverse("embedding").alias("embedding"))
    )
    with pytest.raises(ValueError, match="conflicting embeddings"):
        run(conflict)
    # and the clean corpus still answers, fully distributed
    assert len(run(emb)) == V.TOP_K


@pytest.mark.scale
def test_batch_oversized_budget_distributed_and_equal(
    spark, tmp_path, monkeypatch
):
    """Batch twin: above the cap ivfpq_probe_batch reranks distributed
    ((qid, vec_id) pairs JOIN the corpus — the driver never sees
    nq*rerank pairs) and stays row-identical to the driver path at the
    same explicit rerank."""
    emb8 = _emb8(spark)
    idx = V.ivfpq_build(emb8, str(tmp_path / "ivfpq8b"))
    qids = [0, 10_000_001, 70_000_002]
    queries = emb8.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    _, width = V._ivfpq_batch_candidates(spark, idx, queries)
    assert width > 128
    via_driver = sorted(
        tuple(r)
        for r in V.ivfpq_probe_batch(
            spark, idx, queries, emb8, rerank=width
        ).collect()
    )
    monkeypatch.setattr(V, "ADC_RERANK_MAX", 128)
    _forbid_fetch(monkeypatch)
    via_dist = sorted(
        tuple(r)
        for r in V.ivfpq_probe_batch(spark, idx, queries, emb8).collect()
    )
    assert via_dist == via_driver
