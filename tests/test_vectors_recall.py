"""Recall gate for the multi-probe sign-LSH scale path.

The driver testdata embeddings are near-random (no planted duplicates), so
recall is measured on a fixture with known ground truth: base vectors plus
small-noise perturbed copies (cos ~ 0.995). The multi-probe candidate
generator must recover >= 0.9 of the planted pairs — the property the
16-bit + hamming<=2 parameterization was chosen for.
"""

from __future__ import annotations

import numpy as np
import pytest

from realtime_gmall_flink_spark.plans.vectors import (
    ANN_BITS,
    ANN_PROBE_RADIUS,
    embedding_near_dup_pairs,
)

N_PAIRS = 60
NOISE = 0.1  # cos(base, perturbed) ~ 0.995; ~1.5% of pairs drift past
# hamming 2 at this noise level, so the 0.9 gate has real headroom


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(N_PAIRS):
        base = rng.normal(size=64)
        pert = base + rng.normal(scale=NOISE, size=64)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in pert]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_multiprobe_recall_on_planted_duplicates(planted):
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(
            planted, threshold=0.9
        ).collect()
    }
    truth = {(2 * i, 2 * i + 1) for i in range(N_PAIRS)}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"multi-probe recall {recall} < 0.9"
    # every reported pair must actually be a near-dup (planted pairs are
    # the only cos>=0.9 pairs among independent gaussians)
    assert got <= truth


def test_multiprobe_beats_exact_bucket_recall(planted):
    """Probing the hamming<=2 neighborhood must dominate the exact-bucket
    (radius 0) join — the reason multi-probe exists."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(
            planted, radius=0, threshold=0.9
        ).collect()
    }
    probed = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(
            planted, radius=ANN_PROBE_RADIUS, threshold=0.9
        ).collect()
    }
    assert exact <= probed
    assert len(probed) > len(exact)


def test_probe_mask_neighborhood_complete():
    """Every hamming<=radius bucket pair is reached by exactly one mask."""
    from realtime_gmall_flink_spark.functions.similarity import probe_masks

    masks = probe_masks(ANN_BITS, ANN_PROBE_RADIUS)
    assert len(masks) == len(set(masks))  # exactly-once join matches
    assert len(masks) == 1 + ANN_BITS + ANN_BITS * (ANN_BITS - 1) // 2
    assert all(bin(m).count("1") <= ANN_PROBE_RADIUS for m in masks)


def test_arrow_topk_matches_exact_fold(spark):
    """The vectorized Arrow path must return the same neighbors as the
    oracle-exact JVM fold (values to float precision, ids exactly)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ann_cosine_topk,
        ann_cosine_topk_arrow,
    )

    from .conftest import SF_DIR

    exact = ann_cosine_topk(spark, SF_DIR).collect()
    arrow = ann_cosine_topk_arrow(spark, SF_DIR).collect()
    assert [r["vec_id"] for r in arrow] == [r["vec_id"] for r in exact]
    for a, e in zip(arrow, exact):
        assert abs(a["cos_sim"] - e["cos_sim"]) <= 1e-6


def test_ivf_twins_land_in_same_cell(planted):
    """IVF recall rests on near-duplicates quantizing to the same cell:
    with one Lloyd refinement of the hash-seeded centroids the argmax
    centroid must agree for >= 0.95 of pairs (the seed centroids alone
    manage ~0.92 on this fixture; refinement is what buys the gate)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivf_centroids,
        ivf_refine,
    )

    seed = ivf_centroids(planted, k=8)
    cells = {
        r.vec_id: r.cid
        for r in ivf_assign(planted, ivf_refine(planted, seed, 1)).collect()
    }
    same = sum(1 for i in range(N_PAIRS) if cells[2 * i] == cells[2 * i + 1])
    assert same / N_PAIRS >= 0.95, f"co-cell rate {same / N_PAIRS} < 0.95"

    # the refinement must not be a no-op: it should beat (or at least
    # match) the raw seed assignment on the planted twins
    seed_cells = {
        r.vec_id: r.cid for r in ivf_assign(planted, seed).collect()
    }
    seed_same = sum(
        1 for i in range(N_PAIRS)
        if seed_cells[2 * i] == seed_cells[2 * i + 1]
    )
    assert same >= seed_same


def test_ivf_topk_finds_planted_twin(planted):
    """End-to-end IVF probe: querying a base vector must return its
    perturbed twin first (its own cell is always among the probed)."""
    from realtime_gmall_flink_spark.plans.vectors import ivf_topk

    top = ivf_topk(
        planted, query_vec_id=0, k=3, n_centroids=8, nprobe=2
    ).collect()
    assert top and top[0]["vec_id"] == 1
    assert top[0]["cos_sim"] >= 0.9


def test_ivf_append_extends_persisted_index(spark, tmp_path):
    """Build-once/APPEND-many: vectors appended to a persisted index
    are assigned with the same broadcast argmax as the build and become
    probeable through the same pruned scan — a planted copy of the
    query vector must come back at cosine 1.0, and untouched cell
    partitions keep their files."""
    import os

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        ivf_append,
        ivf_build,
        ivf_probe,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-append-index"))

    planted_id = 10_000_000
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(planted_id).cast("long").alias("vec_id"), "embedding"
    )
    n = ivf_append(spark, idx, planted)
    assert n == 1

    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    top = ivf_probe(
        spark, idx, q, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    by_id = {r["vec_id"]: r["cos_sim"] for r in top}
    assert planted_id in by_id
    assert by_id[planted_id] == 1.0
    # appending must not have rewritten the layout wholesale
    assert os.path.isdir(f"{idx}/centroids")
    # a second append is additive, not destructive
    n2 = ivf_append(
        spark,
        idx,
        planted.select(
            (F.col("vec_id") + 1).alias("vec_id"), "embedding"
        ),
    )
    assert n2 == 1
    top2 = ivf_probe(
        spark, idx, q, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    ids2 = {r["vec_id"] for r in top2}
    assert {planted_id, planted_id + 1} <= ids2


def test_ivf_drift_monitor_flags_lopsided_appends(spark, tmp_path):
    """Fresh index: zero growth, no rebuild recommended. After dumping
    many copies of one vector into a single cell, growth and cell-share
    skew both cross their thresholds and the monitor fires."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_append,
        ivf_build,
        ivf_drift,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-drift"))

    d0 = ivf_drift(spark, idx)
    assert d0["growth"] == 0.0
    assert not d0["rebuild_recommended"]
    assert d0["max_cell_ratio"] <= 1.0 + 1e-9

    n_base = d0["total_build"]
    one = emb.filter(F.col("vec_id") == 0).select("embedding")
    flood = (
        spark.range(n_base)  # +100% growth, all into vec 0's cell
        .select((F.col("id") + 200000).alias("vec_id"))
        .crossJoin(one)
    )
    ivf_append(spark, idx, flood)

    d1 = ivf_drift(spark, idx)
    assert d1["total_now"] == 2 * n_base
    assert d1["growth"] == 1.0
    assert d1["max_cell_ratio"] > 2.0
    assert d1["rebuild_recommended"]


def test_ivf_drift_ignores_stray_vector_in_empty_cell(spark, tmp_path):
    """A build-time-empty cell receiving a handful of appended vectors
    must NOT flip rebuild_recommended (Lloyd can strand a centroid; one
    stray arrival is not drift) — only a material share does."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_build,
        ivf_drift,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-stray"))
    d0 = ivf_drift(spark, idx)
    # simulate a stray landing in a cell absent from the build stats:
    # append one assignment row under a synthetic cid partition
    one = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.lit(555555).cast("long").alias("vec_id"),
            "embedding",
            F.lit(999999).cast("long").alias("cid"),
        )
    )
    one.write.mode("append").partitionBy("cid").parquet(
        f"{idx}/assignment"
    )
    d1 = ivf_drift(spark, idx)
    assert d1["total_now"] == d0["total_now"] + 1
    assert not d1["rebuild_recommended"]
    assert d1["max_cell_ratio"] != float("inf")


def test_lsh_append_extends_persisted_layout(spark, tmp_path):
    """The LSH layout gets the same build/append/probe lifecycle as the
    IVF index: an appended copy of the query vector is probeable at
    cosine 1.0 (same bucket by construction), and the append is
    idempotent."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.similarity import (
        sign_lsh_bucket,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        lsh_append,
        lsh_build,
        lsh_probe,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = lsh_build(emb, str(tmp_path / "lsh-append"))
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(20_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert lsh_append(spark, idx, planted) == 1
    assert lsh_append(spark, idx, planted) == 0  # idempotent

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
    top = {
        r["vec_id"]: r["cos_sim"]
        for r in lsh_probe(
            spark, idx, q, qrow["b"], exclude_vec_id=QUERY_VEC_ID
        ).collect()
    }
    assert top.get(20_000_000) == 1.0


def test_ivf_refresh_on_drift_rebuilds_and_resets_baseline(
    spark, tmp_path
):
    """The full drift loop: flood one cell past the thresholds,
    ivf_refresh_if_drifted rebuilds in place (new centroids over the
    grown corpus is out of scope here — the INDEX corpus is what was
    passed), and a fresh drift report against the new baseline is
    clean. A no-drift refresh must not rebuild."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_append,
        ivf_build,
        ivf_drift,
        ivf_refresh_if_drifted,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-refresh"))
    r0 = ivf_refresh_if_drifted(spark, idx)
    assert not r0["rebuilt"]

    n_base = r0["total_build"]
    one = emb.filter(F.col("vec_id") == 0).select("embedding")
    flood = (
        spark.range(n_base)
        .select((F.col("id") + 400000).alias("vec_id"))
        .crossJoin(one)
    )
    ivf_append(spark, idx, flood)
    # self-sourced rebuild: the corpus comes from the persisted
    # assignment (build + appends), so appended vectors CANNOT be lost
    r1 = ivf_refresh_if_drifted(spark, idx)
    assert r1["rebuilt"]
    # the rebuilt index covers the grown corpus and its baseline is new
    r2 = ivf_drift(spark, idx)
    assert r2["total_build"] == 2 * n_base
    assert r2["growth"] == 0.0
    assert not r2["rebuild_recommended"]
    kept = (
        spark.read.parquet(f"{idx}/assignment")
        .filter(F.col("vec_id") >= 400000)
        .count()
    )
    assert kept == n_base  # every appended vector survived the rebuild


def test_index_rebuild_swap_killpoint_fuzz(spark, tmp_path, monkeypatch):
    """Kill the rebuild swap at each os.rename (tombstone the old,
    promote the new): every crash window must leave a path that
    recover_index (or the next build/rebuild) heals to a COMPLETE valid
    index — never a missing or half index."""
    import os as _os

    from realtime_gmall_flink_spark.indexutil import recover_index
    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_SUBDIRS,
        ivf_build,
        ivf_rebuild,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    class Kill(Exception):
        pass

    emb = load_table(spark, SF_DIR, "embeddings")
    real_rename = _os.rename
    for kill_at in (1, 2):
        idx = str(tmp_path / f"ivf-swap{kill_at}")
        ivf_build(emb, idx)
        calls = {"n": 0}

        def dying_rename(a, b):
            # only count renames touching the index family, not
            # Spark's own temp-file renames inside the build
            if _os.path.basename(a).startswith(
                _os.path.basename(idx)
            ) or _os.path.basename(b).startswith(_os.path.basename(idx)):
                calls["n"] += 1
                if calls["n"] >= kill_at:
                    raise Kill()
            return real_rename(a, b)

        monkeypatch.setattr(_os, "rename", dying_rename)
        try:
            ivf_rebuild(spark, idx, emb)
            died = False
        except Kill:
            died = True
        finally:
            monkeypatch.setattr(_os, "rename", real_rename)
        assert died, kill_at
        recover_index(idx, IVF_SUBDIRS)
        assert all(
            _os.path.isdir(f"{idx}/{s}") for s in IVF_SUBDIRS
        ), kill_at
        # no leftover rebuild/tombstone debris
        parent = _os.path.dirname(idx)
        base = _os.path.basename(idx)
        debris = [
            d
            for d in _os.listdir(parent)
            if d.startswith(f"{base}.rebuild-")
            or d.startswith(f"{base}.old-")
        ]
        assert debris == [], (kill_at, debris)


def test_ivf_append_replay_is_idempotent(spark, tmp_path):
    """An at-least-once producer replaying the SAME batch (retry,
    checkpoint replay) must not duplicate vec_ids in the persisted
    assignment: the second delivery anti-joins against the existing
    ids and appends nothing — same contract as lsh_append."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        ivf_append,
        ivf_build,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_build(emb, str(tmp_path / "ivf-replay"))
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(5_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert ivf_append(spark, idx, planted) == 1
    # replayed delivery: nothing appended, no duplicate row
    assert ivf_append(spark, idx, planted) == 0
    n_rows = (
        spark.read.parquet(f"{idx}/assignment")
        .filter(F.col("vec_id") == 5_000_000)
        .count()
    )
    assert n_rows == 1
    # and a build-time id replayed through append is skipped too
    base = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "vec_id", "embedding"
    )
    assert ivf_append(spark, idx, base) == 0


def test_recover_index_promotes_newest_candidate(tmp_path):
    """With MULTIPLE complete surviving candidates (two crashed rebuild
    attempts), recovery must promote the NEWEST one — candidates are
    ordered by mtime, not by the lexicographic accident of a uuid
    suffix."""
    import os
    import shutil

    from realtime_gmall_flink_spark.indexutil import recover_index

    subdirs = ("a", "b")
    idx = str(tmp_path / "idx")

    def mk(path: str, marker: str, mtime: float) -> None:
        for s in subdirs:
            os.makedirs(os.path.join(path, s))
        with open(os.path.join(path, "marker"), "w") as f:
            f.write(marker)
        os.utime(path, (mtime, mtime))

    # two complete rebuild candidates; the LEXICOGRAPHICALLY larger
    # suffix is the OLDER one, so a name sort would promote the wrong
    # dir. Do both orderings to be safe against accidental agreement.
    for old_sfx, new_sfx in (("ffff", "aaaa"), ("aaaa", "ffff")):
        for d in os.listdir(tmp_path):
            shutil.rmtree(os.path.join(tmp_path, d), ignore_errors=True)
        mk(f"{idx}.rebuild-{old_sfx}", "old", 1_000_000.0)
        mk(f"{idx}.rebuild-{new_sfx}", "new", 2_000_000.0)
        assert recover_index(idx, subdirs)
        assert open(os.path.join(idx, "marker")).read() == "new", (
            old_sfx,
            new_sfx,
        )
        # losers are swept once the live index is valid
        debris = [d for d in os.listdir(tmp_path) if ".rebuild-" in d]
        assert debris == []


def test_sq8_quantization_recall_and_fidelity(spark, tmp_path):
    """SQ8 is lossy; the gates that matter: (a) midpoint dequantization
    of a vector stays nearly parallel to the original (cos >= 0.9995 —
    256 levels per dim is ~0.2% step size), (b) the quantized top-10
    for the catalog query overlaps the exact top-10 in >= 7 positions
    at sf0.001."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.similarity import (
        cosine_similarity,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        _sq8_stats,
        ann_cosine_topk,
        ann_sq8_topk,
        sq8_dequantized,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    stats = _sq8_stats(emb).select("mn", "mx")
    deq = sq8_dequantized(F.col("embedding"), F.col("mn"), F.col("mx"))
    fid = (
        emb.crossJoin(F.broadcast(stats))
        .select(
            cosine_similarity(deq, F.col("embedding")).alias("self_cos")
        )
        .agg(F.min("self_cos").alias("worst"))
        .head()["worst"]
    )
    assert fid >= 0.9995, fid

    exact = {r["vec_id"] for r in ann_cosine_topk(spark, SF_DIR).collect()}
    sq8 = {r["vec_id"] for r in ann_sq8_topk(spark, SF_DIR).collect()}
    assert len(exact & sq8) >= 7, (exact, sq8)


def test_sq8_persisted_probe_equals_inmem_form(spark, tmp_path):
    """The persisted codes layout must reproduce the index-free SQ8
    form exactly — the tinyint round-trip changes nothing (code
    integers are exact in double)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        sq8_build,
        sq8_probe,
        sq8_topk_inmem,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = sq8_build(emb, str(tmp_path / "sq8"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in sq8_probe(
            spark, idx, q, exclude_vec_id=QUERY_VEC_ID
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in sq8_topk_inmem(spark, SF_DIR).collect()
    ]
    assert got == want


def test_sq8_append_idempotent_and_probeable(spark, tmp_path):
    """Appended vectors become probeable (a planted near-copy of the
    query lands on top); replaying the same batch appends nothing."""
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        sq8_append,
        sq8_build,
        sq8_drift,
        sq8_probe,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = sq8_build(emb, str(tmp_path / "sq8a"))
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(7_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert sq8_append(spark, idx, planted) == 1
    assert sq8_append(spark, idx, planted) == 0  # replay: no dup
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    top = sq8_probe(spark, idx, q, exclude_vec_id=QUERY_VEC_ID).collect()
    assert top[0]["vec_id"] == 7_000_000
    assert top[0]["cos_sim"] >= 0.999  # quantized self-match
    d = sq8_drift(spark, idx)
    assert d["appended"] == 1 and not d["rebuild_recommended"]


def test_sq8_probe_plan_reads_codes_only(spark, tmp_path):
    """The probe must be the build-once/probe-many shape: its plan
    scans the codes parquet (never the float corpus) and contains no
    stats aggregation (no posexplode), only broadcast one-row sides +
    TakeOrdered."""
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        sq8_build,
        sq8_probe,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = sq8_build(emb, str(tmp_path / "sq8p"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    plan = (
        sq8_probe(spark, idx, q, exclude_vec_id=QUERY_VEC_ID)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "codes" in plan
    assert "posexplode" not in plan.lower()
    assert "TakeOrdered" in plan


def test_sq8_refresh_on_drift_resets_ranges_and_baseline(spark, tmp_path):
    """Flooding appends past the growth threshold fires the monitor;
    the refresh (over the explicitly-passed full corpus — codes are
    lossy, no self-sourcing) re-fits the per-dim ranges so previously
    CLAMPED out-of-range vectors get real codes, and resets the drift
    baseline."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        sq8_append,
        sq8_build,
        sq8_drift,
        sq8_probe,
        sq8_refresh_if_drifted,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = sq8_build(emb, str(tmp_path / "sq8r"))
    n_base = sq8_drift(spark, idx)["total_build"]
    # out-of-range flood: 3x every embedding value, fresh ids
    flood = emb.select(
        (F.col("vec_id") + 900_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 3).alias("embedding"),
    ).localCheckpoint(eager=True)
    assert sq8_append(spark, idx, flood) == n_base
    r = sq8_refresh_if_drifted(
        spark,
        idx,
        emb.select("vec_id", "embedding").unionByName(flood),
    )
    assert r["rebuild_recommended"] and r["rebuilt"]
    d = sq8_drift(spark, idx)
    assert d["total_build"] == 2 * n_base and d["growth"] == 0.0
    # a flooded vector now probes back against ITS OWN direction at
    # quantized-self fidelity (pre-refresh its codes were clamped)
    q = flood.filter(F.col("vec_id") == 900_000).select(
        F.col("embedding").alias("qe")
    )
    top = sq8_probe(spark, idx, q).collect()
    ids = [r["vec_id"] for r in top]
    assert 900_000 in ids[:2]


def test_semantic_clusters_group_planted_twins(planted):
    """Each planted (base, perturbed) pair must share a cluster labeled
    by the base id; unrelated vectors stay singletons (independent
    gaussians don't cross the cosine threshold)."""
    from realtime_gmall_flink_spark.plans.textops import (
        star_contraction_components,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        embedding_near_dup_pairs,
    )

    pairs = embedding_near_dup_pairs(planted, threshold=0.9).select(
        "vec_a", "vec_b"
    )
    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in star_contraction_components(
            planted.select("vec_id"), pairs, "vec_id", "cluster_id"
        ).collect()
    }
    paired = sum(
        1 for i in range(N_PAIRS)
        if labels[2 * i] == labels[2 * i + 1] == 2 * i
    )
    assert paired / N_PAIRS >= 0.9  # multi-probe recall floor


def test_sq8_rebuild_killpoint_fuzz(spark, tmp_path, monkeypatch):
    """SQ8's rebuild adds a constraint the shared two-rename argument
    (fuzzed via IVF above) doesn't cover: codes are LOSSY, so no crash
    window may leave the live index destroyed or half-written — there
    is no self-source to rebuild from. Two kill families:

    (a) inside the staged write, between the stats and codes writes —
        the staging dir is incomplete, the LIVE index must be untouched
        (same codes, same stats) and still probe-able;
    (b) at each swap rename — recover_index must heal to a complete
        index, debris swept (mirror of the IVF swap fuzz, pinned here
        because SQ8's non-self-sourcing makes the guarantee
        load-bearing, not just convenient)."""
    import os as _os

    from pyspark.sql.readwriter import DataFrameWriter

    from realtime_gmall_flink_spark.indexutil import recover_index
    from realtime_gmall_flink_spark.plans.vectors import (
        SQ8_SUBDIRS,
        sq8_build,
        sq8_rebuild,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    class Kill(Exception):
        pass

    def _sq8_snapshot(idx):
        return {
            sub: sorted(
                tuple(str(v) for v in r)
                for r in spark.read.parquet(f"{idx}/{sub}").collect()
            )
            for sub in SQ8_SUBDIRS
        }

    emb = load_table(spark, SF_DIR, "embeddings")

    # (a) die between the stats write and the codes write
    idx = str(tmp_path / "sq8-a")
    sq8_build(emb, idx)
    before = _sq8_snapshot(idx)
    real_parquet = DataFrameWriter.parquet

    def dying_parquet(self, path, *a, **k):
        if path.rstrip("/").endswith("codes"):
            raise Kill()
        return real_parquet(self, path, *a, **k)

    monkeypatch.setattr(DataFrameWriter, "parquet", dying_parquet)
    try:
        sq8_rebuild(spark, idx, emb)
        died = False
    except Kill:
        died = True
    finally:
        monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)
    assert died
    # live index untouched bit-for-bit; the crashed staging dir is
    # debris the next build sweeps
    assert _sq8_snapshot(idx) == before
    sq8_rebuild(spark, idx, emb)  # a clean retry completes
    assert _sq8_snapshot(idx) == before  # same corpus -> same layout
    parent, base = _os.path.dirname(idx), _os.path.basename(idx)
    debris = [
        d for d in _os.listdir(parent)
        if d.startswith(base) and d != base
    ]
    assert debris == [], debris

    # (b) die at each swap rename
    real_rename = _os.rename
    for kill_at in (1, 2):
        idx = str(tmp_path / f"sq8-swap{kill_at}")
        sq8_build(emb, idx)
        want = _sq8_snapshot(idx)
        calls = {"n": 0}

        def dying_rename(a, b):
            if _os.path.basename(a).startswith(
                _os.path.basename(idx)
            ) or _os.path.basename(b).startswith(_os.path.basename(idx)):
                calls["n"] += 1
                if calls["n"] >= kill_at:
                    raise Kill()
            return real_rename(a, b)

        monkeypatch.setattr(_os, "rename", dying_rename)
        try:
            sq8_rebuild(spark, idx, emb)
            died = False
        except Kill:
            died = True
        finally:
            monkeypatch.setattr(_os, "rename", real_rename)
        assert died, kill_at
        recover_index(idx, SQ8_SUBDIRS)
        assert all(
            _os.path.isdir(f"{idx}/{s}") for s in SQ8_SUBDIRS
        ), kill_at
        # healed index is COMPLETE and equivalent (same corpus on both
        # sides of the swap, so either roll direction must serve the
        # same quantized layout)
        assert _sq8_snapshot(idx) == want, kill_at
        parent, base = _os.path.dirname(idx), _os.path.basename(idx)
        debris = [
            d
            for d in _os.listdir(parent)
            if d.startswith(f"{base}.rebuild-")
            or d.startswith(f"{base}.old-")
        ]
        assert debris == [], (kill_at, debris)


def test_lsh_bits_persisted_and_validated(spark, tmp_path):
    """The LSH bucket width is a BUILD-time property persisted in
    meta/ (the gram index's k contract applied to LSH): operations
    passing a mismatched width raise instead of silently dropping
    every pair in the uncovered bits; a pre-meta layout is migrated
    in place (appends survive, nothing is rebuilt as debris)."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        lsh_append,
        lsh_build,
        lsh_pair_mine,
        lsh_probe_batch,
        lsh_score_new,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "lsh-meta")
    lsh_build(emb, idx)
    assert os.path.isdir(f"{idx}/meta")
    stored = spark.read.parquet(f"{idx}/meta").head()["bits"]
    assert stored == 16

    # mismatched width raises on every surface that hashes or probes
    with _pytest.raises(ValueError, match="built with bits=16"):
        lsh_build(emb, idx, bits=24)
    with _pytest.raises(ValueError, match="built with bits=16"):
        lsh_append(spark, idx, emb.limit(1), bits=24)
    with _pytest.raises(ValueError, match="built with bits=16"):
        lsh_pair_mine(spark, idx, bits=24)
    with _pytest.raises(ValueError, match="built with bits=16"):
        lsh_score_new(spark, idx, emb.limit(1), bits=24)
    with _pytest.raises(ValueError, match="built with bits=16"):
        lsh_probe_batch(spark, idx, emb.limit(1), {0: 0}, bits=24)

    # pre-meta layout: migrate in place, appended rows survive
    appended = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding"
    )
    assert lsh_append(spark, idx, appended) == 5
    shutil.rmtree(f"{idx}/meta")  # simulate a pre-meta index
    # a non-default caller must NOT stamp the assumed default first —
    # a legacy index genuinely built at another width would be
    # permanently mislabeled and the mismatch error would misstate an
    # assumption as a recorded fact. The migration itself raises,
    # naming the assumption and the delete-and-rebuild remedy, and
    # leaves the layout unstamped (ADVICE r8).
    with _pytest.raises(ValueError, match="predates meta"):
        lsh_build(emb, idx, bits=24)
    from realtime_gmall_flink_spark.indexutil import read_index_meta

    assert read_index_meta(idx) is None  # still pre-meta, not mislabeled
    lsh_build(emb, idx)  # backfills meta; must NOT rebuild from emb
    assert os.path.isdir(f"{idx}/meta")
    kept = (
        spark.read.parquet(f"{idx}/buckets")
        .filter(F.col("vec_id") >= 500000)
        .count()
    )
    assert kept == 5  # a debris-rebuild would have dropped these


def test_lsh_score_new_empty_probe_path_schema(spark, tmp_path):
    """A batch whose reachable high bytes miss every occupied
    partition must return an EMPTY frame whose schema is identical to
    the non-empty path's (the hand-written early-return schema cannot
    drift from the join's)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.similarity import (
        sign_lsh_bucket,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        LSH_HI_SHIFT,
        lsh_build,
        lsh_occupied_his,
        lsh_score_new,
        probe_masks,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    # tiny corpus -> few occupied high bytes -> misses are findable
    idx = lsh_build(emb.filter(F.col("vec_id") < 3), str(tmp_path / "l"))
    occupied = set(lsh_occupied_his(idx))
    assert len(occupied) <= 3
    reach = {m >> LSH_HI_SHIFT for m in probe_masks(16, 2)}

    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            sign_lsh_bucket(F.col("embedding"), bits=16)
            .cast("int")
            .alias("b"),
        )
        .collect()
    }
    missing = next(
        v
        for v, b in sorted(buckets.items())
        if not ({(b >> LSH_HI_SHIFT) ^ r for r in reach} & occupied)
    )
    hitting = 0  # vec 0 is in the corpus: its own bucket always hits

    new_miss = emb.filter(F.col("vec_id") == missing).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    new_hit = emb.filter(F.col("vec_id") == hitting).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    got_empty = lsh_score_new(spark, idx, new_miss)
    got_rows = lsh_score_new(spark, idx, new_hit)
    assert got_empty.count() == 0
    assert got_rows.count() >= 1  # the planted copy at cosine 1.0
    assert got_empty.schema == got_rows.schema


def test_index_meta_backfill_atomic_and_sweeps_stale_staging(
    spark, tmp_path
):
    """write_index_meta_atomic: a crashed earlier attempt leaves only
    an inert .meta-* staging sibling (never a half-written meta/ inside
    the layout); the next backfill sweeps it and lands meta atomically.
    A lost rename race (meta appeared meanwhile) is a clean no-op."""
    import os

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.indexutil import (
        read_index_meta,
        write_index_meta_atomic,
    )
    from realtime_gmall_flink_spark.plans.vectors import lsh_build
    from realtime_gmall_flink_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < 10
    )
    idx = lsh_build(emb, str(tmp_path / "lm"))
    import shutil

    shutil.rmtree(f"{idx}/meta")  # pre-meta layout
    # simulate a crashed earlier backfill: stale staging sibling
    stale = f"{idx}.meta-deadbeef"
    os.makedirs(stale)
    assert write_index_meta_atomic(spark, idx, {"bits": 16})
    assert not os.path.isdir(stale)  # swept after winning the rename
    assert read_index_meta(idx) == {"bits": 16}
    # meta already present -> no-op, value untouched
    assert not write_index_meta_atomic(spark, idx, {"bits": 24})
    assert read_index_meta(idx) == {"bits": 16}

    # wedged meta (legacy crash left the dir without a parquet part):
    # reads fail LOUDLY (a silent default would probe a non-default
    # index at the wrong width); the atomic backfill heals it
    import shutil as _shutil

    import pytest as _pytest

    _shutil.rmtree(f"{idx}/meta")
    os.makedirs(f"{idx}/meta")
    with _pytest.raises(ValueError, match="wedged meta"):
        read_index_meta(idx)
    assert write_index_meta_atomic(spark, idx, {"bits": 16})
    assert read_index_meta(idx) == {"bits": 16}


def test_norm_percentiles_empty_array_and_empty_table_edges(
    spark, tmp_path
):
    """Cross-engine edges the shipped fixed-64-dim testdata never
    exercises: (a) a row with an EMPTY embedding array — Spark's
    0-init fold and DuckDB's NULL list_sum must land on the same
    norm/peak (both coalesced to 0.0, so no NULL classes exist to
    diverge on window NULL ordering); (b) an empty embeddings table —
    zero rows from BOTH engines (the grouped pivot derives its row
    from data; a keyless agg would emit one all-NULL row)."""
    import os
    import shutil

    from realtime_gmall_flink_spark.plans.catalog import catalog
    from realtime_gmall_flink_spark.sources.testdata import TABLE_NAMES

    from .conftest import SF_DIR
    from .oracle_utils import compare

    q = catalog()["embedding_norm_percentiles"]

    edge = str(tmp_path / "edge_sf")
    os.makedirs(edge)
    for t in TABLE_NAMES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{edge}/{t}.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from pyspark.sql import functions as F

    with_empty = emb.limit(5).unionByName(
        emb.limit(1).select(
            (F.col("vec_id") + 777).alias("vec_id"),
            F.expr("CAST(array() AS array<float>)").alias("embedding"),
            "label",
        )
    )
    os.remove(f"{edge}/embeddings.parquet")
    with_empty.coalesce(1).write.parquet(f"{edge}/_emb_tmp")
    part = [
        f
        for f in os.listdir(f"{edge}/_emb_tmp")
        if f.endswith(".parquet")
    ][0]
    shutil.move(f"{edge}/_emb_tmp/{part}", f"{edge}/embeddings.parquet")
    shutil.rmtree(f"{edge}/_emb_tmp")
    assert not compare(q.builder(spark, edge), q.oracle, edge)
    # the empty-array row lands in the norm-0 class: min_norm must be 0
    assert q.builder(spark, edge).collect()[0]["min_norm"] == 0.0

    empty = str(tmp_path / "empty_sf")
    os.makedirs(empty)
    for t in TABLE_NAMES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{empty}/{t}.parquet")
    os.remove(f"{empty}/embeddings.parquet")
    emb.limit(0).coalesce(1).write.parquet(f"{empty}/_emb_tmp")
    part = [
        f
        for f in os.listdir(f"{empty}/_emb_tmp")
        if f.endswith(".parquet")
    ][0]
    shutil.move(f"{empty}/_emb_tmp/{part}", f"{empty}/embeddings.parquet")
    shutil.rmtree(f"{empty}/_emb_tmp")
    assert q.builder(spark, empty).count() == 0
    assert not compare(q.builder(spark, empty), q.oracle, empty)


def test_pq_recall_and_unit_normalization(spark):
    """PQ is a lossy CANDIDATE generator with an exact-cosine rerank,
    so the gates: (a) recall@10 vs exact cosine >= 0.9 at sf0.001
    (measured 1.0 with M=16/K=16 — the config note on PQ_M documents
    the sweep), and (b) pq_unit really is unit-length (norm-1 within
    fp) and maps the zero vector to zero instead of NaN."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.similarity import l2_norm
    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        _pq_normalized,
        ann_cosine_topk,
        ann_pq_topk,
    )

    from .conftest import SF_DIR

    exact = {r["vec_id"] for r in ann_cosine_topk(spark, SF_DIR).collect()}
    pq = {r["vec_id"] for r in ann_pq_topk(spark, SF_DIR).collect()}
    assert len(exact & pq) / len(exact) >= 0.9, (exact, pq)

    emb = _emb(spark, SF_DIR)
    bad = (
        _pq_normalized(emb)
        .select(F.abs(l2_norm(F.col("ne")) - 1.0).alias("err"))
        .filter(F.col("err") > 1e-9)
        .count()
    )
    assert bad == 0
    zero = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    zrow = _pq_normalized(zero).head()
    assert all(x == 0.0 for x in zrow["ne"])


def test_pq_persisted_probe_equals_inmem_form(spark, tmp_path):
    """pq_build + pq_probe must reproduce ann_pq_topk exactly: the
    persisted codebooks are the same deterministic training output, the
    dense-rank codes round-trip through tinyint losslessly, and the
    rank-keyed lookup table selects the same candidates as the inmem
    cid-keyed map (rank order == cid order by construction)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        pq_build,
        pq_probe,
        pq_topk_inmem,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = pq_build(emb, str(tmp_path / "pq"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in pq_probe(
            spark, idx, q, emb, exclude_vec_id=QUERY_VEC_ID
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in pq_topk_inmem(spark, SF_DIR).collect()
    ]
    assert got == want


def test_pq_append_idempotent_and_probeable(spark, tmp_path):
    """Appended vectors become probeable (a planted copy of the query
    ADC-ranks at the minimum possible sum — its cells ARE the query's
    argmin cells — and reranks to cos 1.0); replaying the same batch
    appends nothing."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        pq_append,
        pq_build,
        pq_drift,
        pq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = pq_build(emb, str(tmp_path / "pqa"))
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(7_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert pq_append(spark, idx, planted) == 1
    assert pq_append(spark, idx, planted) == 0  # replay: no dup
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.select("vec_id", "embedding").unionByName(
        planted.select("vec_id", "embedding")
    )
    top = pq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert top[0]["vec_id"] == 7_000_000
    assert top[0]["cos_sim"] == 1.0  # exact rerank, exact copy
    d = pq_drift(spark, idx)
    assert d["appended"] == 1 and not d["rebuild_recommended"]


def test_pq_probe_adc_scans_codes_not_floats(spark, tmp_path):
    """The build-once/probe-many shape: the candidate (ADC) plan scans
    the pq_m-byte codes parquet and NEVER the float corpus (no
    embeddings source, no training posexplode), cut with TakeOrdered;
    the returned probe frame reranks the validated driver-side
    candidate snapshot — its plan holds NO corpus scan at all (the only
    parquet read is the one-row query side) and no join beyond the
    broadcast one-row cross."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        pq_adc_candidates,
        pq_build,
        pq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = pq_build(emb, str(tmp_path / "pqp"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    adc_plan = (
        pq_adc_candidates(spark, idx, q, exclude_vec_id=QUERY_VEC_ID)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "codes" in adc_plan
    # exactly two scans: codes and codebooks — the query side is
    # fetched ONCE (bounded) and inlined as a literal, so the ADC plan
    # carries no query-side scan and no broadcast build at all
    assert adc_plan.count("FileScan parquet") == 2
    assert "posexplode" not in adc_plan.lower()
    assert "TakeOrdered" in adc_plan
    # the query side contributes NO scan and NO filter — it is an
    # inlined literal, so no EqualTo(vec_id, <query>) point lookup
    # remains anywhere in the candidate plan (the only vec_id filter
    # left is the exclude-self NOT-EqualTo on the codes scan)
    assert "SortMergeJoin" not in adc_plan
    probe_plan = (
        pq_probe(spark, idx, q, emb, exclude_vec_id=QUERY_VEC_ID)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in probe_plan
    assert "TakeOrdered" in probe_plan
    # the rerank scores a bounded LOCAL snapshot of the validated
    # candidates against the inlined query literal: no parquet scan of
    # any kind and no join — the plan is local-only
    assert probe_plan.count("FileScan parquet") == 0
    assert "Join" not in probe_plan


def test_pq_refresh_on_drift_resets_baseline(spark, tmp_path):
    """Flooding appends past the growth threshold fires the monitor;
    the refresh (over the explicitly-passed full corpus — codes are
    lossy, no self-sourcing) retrains codebooks over the grown corpus
    and resets the drift baseline."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        pq_append,
        pq_build,
        pq_drift,
        pq_refresh_if_drifted,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = pq_build(emb, str(tmp_path / "pqr"))
    n_base = pq_drift(spark, idx)["total_build"]
    flood = emb.select(
        (F.col("vec_id") + 900_000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    ).localCheckpoint(eager=True)
    assert pq_append(spark, idx, flood) == n_base
    r = pq_refresh_if_drifted(
        spark,
        idx,
        emb.select("vec_id", "embedding").unionByName(flood),
    )
    assert r["rebuild_recommended"] and r["rebuilt"]
    d = pq_drift(spark, idx)
    assert d["total_build"] == 2 * n_base and d["growth"] == 0.0


def test_pq_probe_adapts_to_persisted_params(spark, tmp_path, monkeypatch):
    """Probe geometry comes from the index meta, not module constants:
    an index built at (m=16, sub=4) keeps probing identically after the
    constants change — the migrate-never-invalidate invariant applied
    to PQ. A meta-less dir is refused by name."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.pq_build(emb, str(tmp_path / "pqm"))
    q = emb.filter(F.col("vec_id") == V.QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    before = [
        tuple(r)
        for r in V.pq_probe(
            spark, idx, q, emb, exclude_vec_id=V.QUERY_VEC_ID
        ).collect()
    ]
    monkeypatch.setattr(V, "PQ_M", 4)
    monkeypatch.setattr(V, "PQ_SUBDIM", 16)
    after = [
        tuple(r)
        for r in V.pq_probe(
            spark, idx, q, emb, exclude_vec_id=V.QUERY_VEC_ID
        ).collect()
    ]
    assert before == after
    with _pytest.raises(ValueError, match="no meta"):
        V.pq_probe(spark, str(tmp_path), q, emb)


def test_pq_probe_refuses_partial_rerank_corpus(spark, tmp_path):
    """An emb that does not cover the indexed ids must fail LOUDLY at
    probe construction (eager driver-side validation of the bounded
    candidate set), never return a silently shrunken top-k; ids with
    CONFLICTING embeddings are refused rather than arbitrarily
    resolved; and the tinyint code guard refuses k > 128 before any
    encode work."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.pq_build(emb, str(tmp_path / "pqg"))
    q = emb.filter(F.col("vec_id") == V.QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    partial = emb.filter(F.col("vec_id") % 2 == 0)
    with _pytest.raises(ValueError, match="missing from the rerank corpus"):
        V.pq_probe(spark, idx, q, partial, exclude_vec_id=V.QUERY_VEC_ID)
    # a COMPLETELY disjoint corpus (wrong table/snapshot) must raise
    # too, not return an empty frame — zero overlap is the worst input
    disjoint = emb.select(
        (F.col("vec_id") + 50_000_000).alias("vec_id"), "embedding"
    )
    with _pytest.raises(ValueError, match="missing from the rerank corpus"):
        V.pq_probe(spark, idx, q, disjoint, exclude_vec_id=V.QUERY_VEC_ID)
    # duplicate ids (a replayed append union) are the DOCUMENTED
    # build+appends shape: tolerated, deduped, same result as clean
    clean = V.pq_probe(
        spark, idx, q, emb, exclude_vec_id=V.QUERY_VEC_ID
    ).collect()
    assert len(clean) == V.TOP_K
    doubled = emb.select("vec_id", "embedding").unionByName(
        emb.select("vec_id", "embedding")
    )
    dup = V.pq_probe(
        spark, idx, q, doubled, exclude_vec_id=V.QUERY_VEC_ID
    ).collect()
    assert [tuple(r) for r in dup] == [tuple(r) for r in clean]
    # the same id carrying DIFFERENT embeddings is an inconsistent
    # corpus: refused by name, never resolved by arbitrary row pick
    conflict = emb.select("vec_id", "embedding").unionByName(
        emb.select("vec_id", F.reverse("embedding").alias("embedding"))
    )
    with _pytest.raises(ValueError, match="conflicting embeddings"):
        V.pq_probe(spark, idx, q, conflict, exclude_vec_id=V.QUERY_VEC_ID)
    # NULL embeddings must not slip past the consistency checks (both
    # count_distinct and min skip NULLs) nor score as NULL cos_sim
    nulled = emb.select("vec_id", "embedding").unionByName(
        emb.select(
            "vec_id", F.lit(None).cast("array<float>").alias("embedding")
        )
    )
    with _pytest.raises(ValueError, match="NULL embeddings"):
        V.pq_probe(spark, idx, q, nulled, exclude_vec_id=V.QUERY_VEC_ID)
    # the validation fetch itself must stay a pushed point-scan: the
    # candidate ids reach the parquet scan as an In filter
    fetch_plan = (
        V._pq_rerank_fetch(emb, [1, 2, 3])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(vec_id, [" in fetch_plan
    # a query frame without exactly one row is refused up front — an
    # empty q would NULL every lookup entry and rank arbitrary ids
    with _pytest.raises(ValueError, match="exactly one row"):
        V.pq_probe(spark, idx, q.limit(0), emb)
    with _pytest.raises(ValueError, match="exactly one row"):
        V.pq_probe(spark, idx, q.unionByName(q), emb)
    with _pytest.raises(ValueError, match="tinyint code range"):
        V._pq_encode(None, None, 16, 4, 200)


def test_ivfpq_recall_and_pruning_trade(spark):
    """IVF-PQ stacks two lossy stages; with residual encoding (v3) the
    ADC stage is LOSSLESS on this fixture — the composed probe returns
    exactly the cell-true top-k (== ann_ivf_topk, the exact search
    within the same probed cells), so the only remaining recall loss
    is the nprobe=4/16 cell cut itself: measured recall@10 0.8 at
    sf0.001 (the pruning ceiling; plain PQ reaches 1.0 because it
    scans ALL cells). Gates: recall >= 0.8 (raised from 0.7 — the r10
    VERDICT item), exactly TOP_K rows, and set-equality with the IVF
    ceiling. NOTE the PQ and IVF-PQ rerank candidate sets are NOT
    nested (the cell cut happens before the top-64 ADC cut), so no
    ordering between the two recalls is asserted."""
    from realtime_gmall_flink_spark.plans.vectors import (
        TOP_K,
        ann_cosine_topk,
        ann_ivf_topk,
        ann_ivfpq_topk,
    )

    from .conftest import SF_DIR

    exact = [r["vec_id"] for r in ann_cosine_topk(spark, SF_DIR).collect()]
    ivfpq = [r["vec_id"] for r in ann_ivfpq_topk(spark, SF_DIR).collect()]
    assert len(ivfpq) == TOP_K
    r_ivfpq = len(set(exact) & set(ivfpq)) / len(exact)
    assert r_ivfpq >= 0.8, (exact, ivfpq)
    # ADC losslessness at the rerank budget: the composed probe equals
    # exact search restricted to the same probed cells
    ceiling = {r["vec_id"] for r in ann_ivf_topk(spark, SF_DIR).collect()}
    assert set(ivfpq) == ceiling, (sorted(ceiling), ivfpq)


def test_ivfpq_persisted_probe_scans_pruned_codes_only(spark, tmp_path):
    """The flagship 100 TB shape: the IVF-PQ candidate (ADC) plan scans
    the cid-PARTITIONED codes parquet pruned to nprobe cells by a
    literal PartitionFilter, and NEVER a float — the codes layout has
    no embedding column at all, the lookup-table side folds codebooks
    into one broadcast row, and the only embeddings.parquet read is the
    one-row query point lookup. The probe result equals the catalog
    entry (same layout, same oracle-checked semantics)."""
    import os
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_NPROBE,
        QUERY_VEC_ID,
        _emb,
        ivfpq_adc_candidates,
        ivfpq_build,
        ivfpq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpq"))
    cells = [
        d
        for d in os.listdir(os.path.join(idx, "codes"))
        if d.startswith("cid=")
    ]
    assert len(cells) > IVF_NPROBE  # pruning has something to prune
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
    assert len(pruned_cids(plan)) == IVF_NPROBE
    # codes-only IO: the codes scan's ReadSchema carries NO embedding
    # column (vec_id + tinyint ranks only), and the float corpus never
    # appears — the query vector is fetched once (bounded) and inlined
    # as a literal, so the ADC plan carries no query-side scan
    assert_codes_scans_no_embedding(plan)
    assert plan.count("embeddings.parquet") == 0
    assert "posexplode" not in plan.lower()  # probe, not build, plan
    exec_plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in exec_plan
    # embedding never survives into the ADC scan output either
    assert "embedding" not in exec_plan.split("FileScan")[0]

    top = ivfpq_probe(
        spark, idx, q, emb, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    from realtime_gmall_flink_spark.plans.vectors import ann_ivfpq_topk

    want = ann_ivfpq_topk(spark, SF_DIR).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in want]


def test_ivfpq_append_idempotent_and_probeable(spark, tmp_path):
    """Appended vectors land in their assigned cell partition and
    become probeable (a planted copy of the query ADC-ranks at the
    minimum sum within the probed cells and reranks to cos 1.0);
    replaying the same batch appends nothing; drift tracks the appended
    fraction against the meta baseline."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        ivfpq_append,
        ivfpq_build,
        ivfpq_drift,
        ivfpq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpqa"))
    planted = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(7_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert ivfpq_append(spark, idx, planted) == 1
    assert ivfpq_append(spark, idx, planted) == 0  # replay: no dup
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.select("vec_id", "embedding").unionByName(
        planted.select("vec_id", "embedding")
    )
    top = ivfpq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert top[0]["vec_id"] == 7_000_000
    assert top[0]["cos_sim"] == 1.0  # exact rerank, exact copy
    d = ivfpq_drift(spark, idx)
    assert d["appended"] == 1 and not d["rebuild_recommended"]


def test_ivfpq_refresh_on_drift_resets_baseline(spark, tmp_path):
    """Flooding appends past the growth threshold fires the monitor;
    the refresh retrains BOTH parents over the explicitly-passed full
    corpus (lossy codes — no self-sourcing) and resets the baseline."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_append,
        ivfpq_build,
        ivfpq_drift,
        ivfpq_refresh_if_drifted,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpqr"))
    n_base = ivfpq_drift(spark, idx)["total_build"]
    flood = emb.select(
        (F.col("vec_id") + 900_000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    ).localCheckpoint(eager=True)
    assert ivfpq_append(spark, idx, flood) == n_base
    r = ivfpq_refresh_if_drifted(
        spark,
        idx,
        emb.select("vec_id", "embedding").unionByName(flood),
    )
    assert r["rebuild_recommended"] and r["rebuilt"]
    d = ivfpq_drift(spark, idx)
    assert d["total_build"] == 2 * n_base and d["growth"] == 0.0


def test_ivfpq_build_refuses_inconsistent_parents(spark, tmp_path):
    """A parent pair whose corpora diverged (one appended without the
    other) must fail the composed build BY NAME — the join would
    otherwise silently drop the unmatched rows from the index."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivf_build,
        ivfpq_build,
        pq_append,
        pq_build,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    ivf_dir = str(tmp_path / "p-ivf")
    pq_dir = str(tmp_path / "p-pq")
    ivf_build(emb, ivf_dir)
    pq_build(emb, pq_dir)
    extra = emb.limit(1).select(
        F.lit(8_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert pq_append(spark, pq_dir, extra) == 1
    # the raw (v2) composition is the path that joins two parents —
    # residual layouts train codebooks inline and have no PQ parent
    with _pytest.raises(ValueError, match="parent indexes disagree"):
        ivfpq_build(
            emb,
            str(tmp_path / "composed"),
            ivf_dir=ivf_dir,
            pq_dir=pq_dir,
            encoding="raw",
        )


def test_ivfpq_probe_adapts_to_persisted_params(spark, tmp_path, monkeypatch):
    """Probe geometry comes from the index meta, not module constants
    (migrate-never-invalidate); a meta-less dir is refused by name; an
    empty-build index reports growth 0.0 until something is appended
    (the drift monitor must not fire pointless rebuilds)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.ivfpq_build(emb, str(tmp_path / "ivfpqm"))
    q = emb.filter(F.col("vec_id") == V.QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    before = [
        tuple(r)
        for r in V.ivfpq_probe(
            spark, idx, q, emb, exclude_vec_id=V.QUERY_VEC_ID
        ).collect()
    ]
    monkeypatch.setattr(V, "PQ_M", 4)
    monkeypatch.setattr(V, "PQ_SUBDIM", 16)
    after = [
        tuple(r)
        for r in V.ivfpq_probe(
            spark, idx, q, emb, exclude_vec_id=V.QUERY_VEC_ID
        ).collect()
    ]
    assert before == after
    with _pytest.raises(ValueError, match="no meta"):
        V.ivfpq_probe(spark, str(tmp_path), q, emb)
    # empty-build drift contract (shared _growth_fraction): no appends
    # -> growth 0.0, no rebuild recommendation
    assert V._growth_fraction(0, 0) == 0.0
    assert V._growth_fraction(0, 5) == float("inf")
    assert V._growth_fraction(10, 5) == 0.5


def test_pq_batch_probe_single_codes_scan(spark, tmp_path):
    """pq_probe_batch: ONE scan of the persisted codes regardless of
    query count (the N per-query lookup tables ride a broadcast side),
    no float column read outside the query lookups, and per-qid results
    equal to N single-query probes."""
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_BATCH_QIDS,
        _emb,
        pq_build,
        pq_probe,
        pq_probe_batch,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = pq_build(emb, str(tmp_path / "pqb"))
    queries = emb.filter(
        F.col("vec_id").isin(list(IVF_BATCH_QIDS))
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    got = pq_probe_batch(spark, idx, queries, emb)
    rows = sorted(
        (r["qid"], r["rk"], r["vec_id"], r["cos_sim"])
        for r in got.collect()
    )
    want = []
    for qid in IVF_BATCH_QIDS:
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qe")
        )
        for rk, r in enumerate(
            pq_probe(spark, idx, q, emb, exclude_vec_id=qid).collect(), 1
        ):
            want.append((qid, rk, r["vec_id"], r["cos_sim"]))
    assert rows == sorted(want)
    # plan shape: the candidate stage (pre-collect, geometry from the
    # persisted meta) reads codes ONCE for all N queries
    from realtime_gmall_flink_spark.plans.vectors import (
        pq_batch_candidates,
    )

    from .plan_utils import formatted_plan

    cand = pq_batch_candidates(spark, idx, queries)
    plan = formatted_plan(cand)
    assert plan.count("pqb/codes") == 1
    assert "posexplode" not in plan.lower()


def test_ivfpq_batch_probe_single_pruned_codes_scan(spark, tmp_path):
    """ivfpq_probe_batch: ONE scan of the cid-partitioned codes pruned
    to the union of all probed cells (literal PartitionFilter, <=
    nq*nprobe cells), codes-only ReadSchema, per-qid results equal to N
    single-query probes."""
    import re

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_BATCH_QIDS,
        IVF_NPROBE,
        _emb,
        ivfpq_build,
        ivfpq_probe,
        ivfpq_probe_batch,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpqb"))
    queries = emb.filter(
        F.col("vec_id").isin(list(IVF_BATCH_QIDS))
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    got = ivfpq_probe_batch(spark, idx, queries, emb)
    rows = sorted(
        (r["qid"], r["rk"], r["vec_id"], r["cos_sim"])
        for r in got.collect()
    )
    want = []
    for qid in IVF_BATCH_QIDS:
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qe")
        )
        for rk, r in enumerate(
            ivfpq_probe(
                spark, idx, q, emb, exclude_vec_id=qid
            ).collect(),
            1,
        ):
            want.append((qid, rk, r["vec_id"], r["cos_sim"]))
    assert rows == sorted(want)
    # plan shape, promised by the name: ONE codes scan pruned to the
    # union of all probed cells with a literal PartitionFilter (<=
    # nq*nprobe cells), codes-only ReadSchema
    from realtime_gmall_flink_spark.plans.vectors import (
        ivfpq_batch_candidates,
    )

    from .plan_utils import (
        assert_codes_scans_no_embedding,
        formatted_plan,
        pruned_cids,
    )

    cand = ivfpq_batch_candidates(spark, idx, queries)
    plan = formatted_plan(cand)
    assert plan.count("ivfpqb/codes") == 1
    cells = pruned_cids(plan)
    assert 1 < len(cells) <= len(IVF_BATCH_QIDS) * IVF_NPROBE
    assert_codes_scans_no_embedding(plan)
    assert "posexplode" not in plan.lower()

    # batch-frame refusals: empty, duplicate-qid, and NULL-qid query
    # frames fail eagerly by name, never silently score nothing /
    # double-score / drop a query
    import pytest as _pytest

    with _pytest.raises(ValueError, match="is empty"):
        ivfpq_probe_batch(spark, idx, queries.limit(0), emb)
    with _pytest.raises(ValueError, match="duplicate qids"):
        ivfpq_probe_batch(
            spark, idx, queries.unionByName(queries), emb
        )
    nulled = queries.unionByName(
        queries.limit(1).select(
            F.lit(None).cast("long").alias("qid"), "qe"
        )
    )
    with _pytest.raises(ValueError, match="NULL qids"):
        ivfpq_probe_batch(spark, idx, nulled, emb)


def test_batch_probe_query_side_localizes_once(spark, tmp_path):
    """The batch probes collect their query side ONCE
    (_localized_query_batch: validation + localization in the same
    bounded action): (a) the localized frame carries the validation
    flag so _require_query_batch schedules no re-check job, (b) the
    probe's RESULT plan is free of any parquet scan — candidates,
    validated snapshot, pairs and queries are all bounded local
    relations by the time the caller executes it (the single-probe
    local-only rerank contract, batch form), and (c) localization is
    value-exact: results equal the raw-frame call bit-for-bit."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_BATCH_QIDS,
        _emb,
        _localized_query_batch,
        _require_query_batch,
        ivfpq_build,
        ivfpq_probe_batch,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "ivfpqloc"))
    queries = emb.filter(
        F.col("vec_id").isin(list(IVF_BATCH_QIDS))
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    loc = _localized_query_batch(queries, "test", want_dim=64)
    # (a) flagged + rows attached; the re-check is a driver no-op
    assert getattr(loc, "_gmall_batch_prevalidated", False)
    assert len(loc._gmall_batch_rows) == len(IVF_BATCH_QIDS)
    before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    _require_query_batch(loc, caller="test", want_dim=64)
    assert (
        spark.sparkContext._jsc.sc().dagScheduler().nextJobId() == before
    )
    # (b) the executed result plan is local-only: every parquet scan
    # (codes, corpus fetch, query side) already happened inside the
    # probe's bounded actions
    out = ivfpq_probe_batch(spark, idx, queries, emb)
    probe_plan = out._jdf.queryExecution().executedPlan().toString()
    assert probe_plan.count("FileScan parquet") == 0
    # (c) localization never changes a result row
    got = sorted(map(tuple, out.collect()))
    raw = sorted(
        map(
            tuple,
            ivfpq_probe_batch(spark, idx, loc, emb).collect(),
        )
    )
    assert got == raw


def test_append_surfaces_refuse_null_ids_and_batch_excludes_optional(
    spark, tmp_path
):
    """(a) Every append surface refuses NULL vec_ids by name — a NULL
    id would poison the layout (never anti-joins, never point-fetches)
    or silently vanish in the composed join. (b) The persisted-parents
    default: a rebuild that omits the parent dirs retrains the SAME
    parents recorded at build time. (c) exclude_self=False lets
    external queries whose qids collide with corpus ids keep those
    neighbors."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    nulled = emb.limit(3).select(
        F.lit(None).cast("long").alias("vec_id"), "embedding"
    )
    ivf = V.ivf_build(emb, str(tmp_path / "ivf"))
    pq = V.pq_build(emb, str(tmp_path / "pq"))
    ivfpq = V.ivfpq_build(
        emb, str(tmp_path / "ivfpq"), ivf_dir=ivf, pq_dir=pq
    )
    sq8 = V.sq8_build(emb, str(tmp_path / "sq8"))
    for fn, idx in (
        (V.ivf_append, ivf),
        (V.pq_append, pq),
        (V.ivfpq_append, ivfpq),
        (V.sq8_append, sq8),
    ):
        with _pytest.raises(ValueError, match="NULL"):
            fn(spark, idx, nulled)
    lsh = V.lsh_build(emb, str(tmp_path / "lsh"))
    with _pytest.raises(ValueError, match="NULL"):
        V.lsh_append(spark, lsh, nulled)
    # NULL-id corpora are refused at build too
    with _pytest.raises(ValueError, match="NULL vec_ids"):
        V.pq_build(
            emb.select("vec_id", "embedding").unionByName(nulled),
            str(tmp_path / "pq-null"),
        )

    # (c) exclude_self=False keeps colliding-id neighbors: qid 0's own
    # corpus row (cos 1.0) tops its list (checked BEFORE the rebuild
    # below grows the shared pq parent past this rerank corpus)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = V.pq_probe_batch(
        spark, pq, queries, emb, exclude_self=False
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        assert rows[0]["vec_id"] == qid and rows[0]["cos_sim"] == 1.0

    # (b) persisted parents: rebuild with omitted dirs retrains the
    # recorded parent (its tree changes), not sibling forks. A v3
    # residual layout records NO pq parent (codebooks train inline) —
    # the persisted pq_dir reads back as absent.
    import os

    assert V._ivfpq_persisted_parents(spark, ivfpq) == (
        os.path.abspath(ivf),
        None,
    )
    corpus2 = emb.select("vec_id", "embedding").unionByName(
        emb.select(
            (F.col("vec_id") + 900_000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
        )
    )
    V.ivfpq_rebuild(spark, ivfpq, corpus2)
    assert not os.path.isdir(str(tmp_path / "ivfpq-ivf"))  # no fork
    assert not os.path.isdir(str(tmp_path / "ivfpq-pq"))
    n2 = spark.read.parquet(os.path.join(ivfpq, "codes")).count()
    n_ivf = spark.read.parquet(os.path.join(ivf, "assignment")).count()
    assert n2 == n_ivf == 2 * emb.count()  # SAME ivf parent retrained
    # the standalone pq index is NOT a residual layout's parent: it
    # must be untouched by the rebuild
    assert (
        spark.read.parquet(os.path.join(pq, "codes")).count()
        == emb.count()
    )


def test_sdc_pair_mining_codes_only_and_copy_pairs_at_zero(spark, tmp_path):
    """SDC (codes-vs-codes) pair mining: (a) a planted exact copy
    pairs with its source at distance 0 as the global closest pair —
    identical vectors encode to identical codes in the same cell; (b)
    the mining plan reads NO floats at all: zero embeddings.parquet
    scans, no-embedding ReadSchema on every codes scan, and the cut is
    a TakeOrdered (map-side top-k, no pair-space exchange for a global
    sort)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_build,
        sdc_pair_mine,
    )

    from .conftest import SF_DIR
    from .plan_utils import assert_codes_scans_no_embedding, formatted_plan

    emb = _emb(spark, SF_DIR)
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") == 7).select(
            F.lit(7_000_000).cast("long").alias("vec_id"), "embedding"
        )
    )
    idx = ivfpq_build(corpus, str(tmp_path / "sdc"))
    pairs = sdc_pair_mine(spark, idx)
    plan = formatted_plan(pairs)
    assert "embeddings.parquet" not in plan  # never reads a float row
    assert_codes_scans_no_embedding(plan)
    exec_plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in exec_plan
    top = pairs.collect()
    assert (top[0]["a_id"], top[0]["b_id"]) == (7, 7_000_000)
    assert top[0]["sdc_micro"] == 0  # identical codes, identical cell


def test_adaptive_nlist_and_sdc_sizing():
    """The corpus-derived geometry defaults: Theta(sqrt n) cells for
    ANN probes (floored at the documented sandbox IVF_CENTROIDS), and
    ~n/sqrt(2*max_pairs) cells for pair mining so per-cell pair volume
    stays within SDC_MAX_CELL_PAIRS — i.e. cells scale ~linearly with
    the corpus and total mining volume stays ~linear, not quadratic."""
    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_CENTROIDS,
        SDC_MAX_CELL_PAIRS,
        adaptive_nlist,
        sdc_nlist_for,
    )

    assert adaptive_nlist(0) == IVF_CENTROIDS
    assert adaptive_nlist(500) == IVF_CENTROIDS  # sandbox floor holds
    assert adaptive_nlist(10_000) == 50
    assert adaptive_nlist(1_000_000) == 500
    n = 10_000_000
    nlist = sdc_nlist_for(n)
    cell = n / nlist
    assert cell * (cell - 1) / 2 <= SDC_MAX_CELL_PAIRS
    assert sdc_nlist_for(8 * n) >= 7 * nlist  # cells ~linear in n
    assert sdc_nlist_for(0) == IVF_CENTROIDS
    assert sdc_nlist_for(n) >= adaptive_nlist(n)


def test_ivf_build_default_geometry_is_corpus_adaptive(spark, tmp_path):
    """ivf_build without n_centroids derives nlist from the corpus: the
    sandbox 500-row corpus keeps the documented floor, an 8x corpus
    gets ~sqrt-scaled cells, and an explicit n_centroids still pins
    (the catalog's oracle-parity contract)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_CENTROIDS,
        _emb,
        adaptive_nlist,
        ivf_build,
    )

    from .conftest import SF_DIR

    base = _emb(spark, SF_DIR)
    idx = ivf_build(base, str(tmp_path / "ivf-floor"))
    assert (
        spark.read.parquet(f"{idx}/centroids").count() == IVF_CENTROIDS
    )
    # per-copy perturbation keeps embeddings DISTINCT: md5-drawn seeds
    # that collide in VALUE collapse under Lloyd (assignment ties break
    # to one cid and the empty cell drops), which would undercount the
    # exact-geometry assertion below
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
    want = adaptive_nlist(n8)
    assert want > IVF_CENTROIDS  # the default really adapted
    idx8 = ivf_build(emb8, str(tmp_path / "ivf-adaptive"))
    assert spark.read.parquet(f"{idx8}/centroids").count() == want
    pinned = ivf_build(
        emb8, str(tmp_path / "ivf-pinned"), n_centroids=IVF_CENTROIDS
    )
    assert (
        spark.read.parquet(f"{pinned}/centroids").count()
        == IVF_CENTROIDS
    )


def test_sdc_pair_mine_refuses_undersized_index(spark, tmp_path):
    """A deliberately undersized index (2 cells over 500 vectors) is
    refused by name BEFORE any mining job — the quadratic pair space is
    the r10 weak mark, and silently mining it at scale is the failure
    the bound exists to prevent. The error carries the worst cells and
    the sdc_nlist_for remedy; a bound sized for the cells accepts."""
    import pytest as _pytest

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_build,
        sdc_pair_mine,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "sdc-small"), n_centroids=2)
    with _pytest.raises(
        ValueError, match="undersized for pair mining"
    ) as ei:
        sdc_pair_mine(spark, idx, max_cell_pairs=10_000)
    msg = str(ei.value)
    assert "cid=" in msg and "sdc_nlist_for" in msg
    # the same layout mines fine under a bound that fits its cells
    rows = sdc_pair_mine(spark, idx, max_cell_pairs=200_000).collect()
    assert len(rows) > 0


def test_ivfpq_raw_v2_read_path_and_encoding_refusal(spark, tmp_path):
    """The v2 (raw-encoded) layout stays fully serviceable — the
    migrate-never-invalidate contract: probe and append adapt to the
    persisted enc_v, a pre-v3 meta (no enc_v field) reads as raw, a
    build requesting the OTHER encoding over an existing layout is
    refused by name (never silently reused as if it matched), and
    ivfpq_rebuild(..., encoding='residual') upgrades in place."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.indexutil import (
        read_index_meta,
        write_meta_into,
    )
    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        TOP_K,
        _emb,
        ivfpq_append,
        ivfpq_build,
        ivfpq_probe,
        ivfpq_rebuild,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivfpq_build(emb, str(tmp_path / "v2raw"), encoding="raw")
    assert read_index_meta(idx)["enc_v"] == 1
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    raw_top = ivfpq_probe(
        spark, idx, q, emb, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert len(raw_top) == TOP_K

    # pre-v3 meta (no enc_v at all) must read as raw: same probe result
    legacy = dict(read_index_meta(idx))
    legacy.pop("enc_v")
    shutil.rmtree(os.path.join(idx, "meta"))
    write_meta_into(spark, os.path.join(idx, "meta"), legacy)
    assert "enc_v" not in read_index_meta(idx)
    legacy_top = ivfpq_probe(
        spark, idx, q, emb, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert legacy_top == raw_top

    # raw append still encodes raw (idempotent second call)
    extra = emb.filter(F.col("vec_id") == 3).select(
        F.lit(3_000_000).cast("long").alias("vec_id"), "embedding"
    )
    assert ivfpq_append(spark, idx, extra) == 1
    assert ivfpq_append(spark, idx, extra) == 0

    # encoding mismatch is refused by name, both directions
    with _pytest.raises(ValueError, match="already holds a raw"):
        ivfpq_build(emb, idx, encoding="residual")
    res_idx = ivfpq_build(emb, str(tmp_path / "v3res"))
    with _pytest.raises(ValueError, match="already holds a residual"):
        ivfpq_build(emb, res_idx, encoding="raw")
    with _pytest.raises(ValueError, match="unknown encoding"):
        ivfpq_build(emb, str(tmp_path / "nope"), encoding="hybrid")

    # in-place upgrade: rebuild as residual over the FULL corpus
    # (append included), then the probe matches a fresh residual build
    full = emb.select("vec_id", "embedding").unionByName(extra)
    ivfpq_rebuild(spark, idx, full, encoding="residual")
    assert read_index_meta(idx)["enc_v"] == 2
    up_top = ivfpq_probe(
        spark, idx, q, full, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    fresh = ivfpq_build(full, str(tmp_path / "v3full"))
    fresh_top = ivfpq_probe(
        spark, fresh, q, full, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert up_top == fresh_top


def test_ivfpq_residual_build_refuses_stale_ivf_parent(spark, tmp_path):
    """A residual build that REUSES an IVF parent trained over a
    different corpus is refused by name — the composed layout would
    silently drop (or resurrect) the mismatched ids."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivf_build,
        ivfpq_build,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    ivf_dir = str(tmp_path / "stale-ivf")
    ivf_build(emb, ivf_dir)
    shrunk = emb.filter(F.col("vec_id") >= 5)
    with _pytest.raises(ValueError, match="IVF parent cache is stale"):
        ivfpq_build(shrunk, str(tmp_path / "res"), ivf_dir=ivf_dir)


def test_ivf_rebuild_preserves_requested_geometry(spark, tmp_path):
    """persist-your-params for nlist: a rebuild (and so a drift
    refresh) with the default n_centroids KEEPS the geometry the build
    REQUESTED — read from the new meta/, not re-derived adaptively and
    not ratcheted down to the post-Lloyd centroid row count. A legacy
    pre-meta layout falls back to the persisted count."""
    import shutil

    from realtime_gmall_flink_spark.indexutil import read_index_meta
    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivf_build,
        ivf_rebuild,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = ivf_build(emb, str(tmp_path / "ivf-pin40"), n_centroids=40)
    assert read_index_meta(idx)["n_centroids"] == 40
    ivf_rebuild(spark, idx)  # default: preserve, not adaptive(500)=16
    assert read_index_meta(idx)["n_centroids"] == 40
    # the ROW count can sit at or below the request (Lloyd drops a
    # cell when md5-drawn seeds collide in value) — the REQUEST is
    # what must survive, which is exactly why it persists in meta/
    n_cells = spark.read.parquet(f"{idx}/centroids").count()
    assert 16 < n_cells <= 40
    # legacy pre-meta layout: fall back to the persisted centroid count
    shutil.rmtree(f"{idx}/meta")
    ivf_rebuild(spark, idx)
    assert read_index_meta(idx)["n_centroids"] == n_cells  # re-stamped
    # explicit re-gearing still wins
    ivf_rebuild(spark, idx, n_centroids=20)
    assert spark.read.parquet(f"{idx}/centroids").count() <= 20
    assert read_index_meta(idx)["n_centroids"] == 20


def test_sdc_clusters_group_planted_copies_codes_only(spark, tmp_path):
    """near_dup_sdc_clusters' building blocks: (a) sdc_dup_pairs is
    threshold-bounded — a planted exact copy yields the (source, copy)
    edge at distance 0, and a threshold BELOW the corpus background
    yields exactly the planted edges, not the whole pair space; (b)
    the edge-set plan is codes-only (no embeddings.parquet scan,
    no-embedding ReadSchema); (c) the components stage clusters the
    copy with its source under one label = min(vec_id); (d) the
    catalog fixture is non-trivial — the sf0.001 corpus forms at
    least one multi-node cluster at SDC_CLUSTER_MICRO, so a silent
    empty-edge regression cannot pass as all-singletons."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        SDC_CLUSTER_MICRO,
        _emb,
        ivfpq_build,
        near_dup_sdc_clusters,
        sdc_dup_pairs,
    )

    from .conftest import SF_DIR
    from .plan_utils import assert_codes_scans_no_embedding, formatted_plan

    emb = _emb(spark, SF_DIR)
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") == 7).select(
            F.lit(7_000_000).cast("long").alias("vec_id"), "embedding"
        )
    )
    idx = ivfpq_build(corpus, str(tmp_path / "sdcc"))
    # threshold 0: exactly the planted identical-codes edge survives
    zero = sdc_dup_pairs(spark, idx, threshold=0)
    plan = formatted_plan(zero)
    assert "embeddings.parquet" not in plan
    assert_codes_scans_no_embedding(plan)
    rows = zero.collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [(7, 7_000_000)]
    # the fixture entry: planted copy lands in its source's cluster
    from realtime_gmall_flink_spark.plans.textops import (
        star_contraction_components,
    )

    comp = star_contraction_components(
        corpus.select("vec_id"),
        sdc_dup_pairs(spark, idx, SDC_CLUSTER_MICRO).select("a_id", "b_id"),
        "vec_id",
        "cluster_id",
    )
    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in comp.filter(
            F.col("vec_id").isin(7, 7_000_000)
        ).collect()
    }
    assert labels[7_000_000] == labels[7] == 7
    # catalog fixture forms real clusters at the pinned threshold
    sizes = (
        near_dup_sdc_clusters(spark, SF_DIR)
        .groupBy("cluster_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert sizes >= 1


def test_ivfpq_payload_lifecycle_and_filtered_probe(spark, tmp_path):
    """Payload-carrying layouts end to end: (a) a filtered probe's
    label predicate is PUSHED into the same cell-pruned codes-only
    scan (PushedFilters EqualTo, literal cid PartitionFilter, no
    embedding column read) and every result row carries the query's
    label; (b) filtering on a no-payload layout, building over a
    corpus missing the payload column, and reusing a layout under a
    DIFFERENT payload set are each refused by name; (c) appends carry
    the payload (and refuse arrivals without it) so appended rows stay
    visible to filtered probes; (d) rebuild preserves the persisted
    payload set without being asked."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        _ivfpq_payload_cols,
        ivfpq_adc_candidates,
        ivfpq_append,
        ivfpq_build,
        ivfpq_probe,
        ivfpq_rebuild,
    )

    from .conftest import SF_DIR
    from .plan_utils import (
        assert_codes_scans_no_embedding,
        formatted_plan,
        pruned_cids,
    )

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "pay")
    ivfpq_build(emb, idx, payload_cols=("label",))
    assert _ivfpq_payload_cols(spark, idx) == ("label",)
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding", "label")
        .head()
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    cand = ivfpq_adc_candidates(
        spark,
        idx,
        q,
        exclude_vec_id=QUERY_VEC_ID,
        payload_eq={"label": qrow["label"]},
    )
    plan = formatted_plan(cand)
    assert pruned_cids(plan)  # literal cid PartitionFilter survives
    assert "EqualTo(label," in plan  # payload predicate reaches parquet
    assert_codes_scans_no_embedding(plan)
    top = ivfpq_probe(
        spark,
        idx,
        q,
        emb,
        exclude_vec_id=QUERY_VEC_ID,
        payload_eq={"label": qrow["label"]},
    )
    got = top.join(
        emb.select("vec_id", "label"), "vec_id"
    ).collect()
    assert got and all(r["label"] == qrow["label"] for r in got)
    # (b) refusals by name
    plain = str(tmp_path / "plain")
    ivfpq_build(emb, plain)
    with _pytest.raises(ValueError, match="not payloads of this layout"):
        ivfpq_adc_candidates(
            spark, plain, q, payload_eq={"label": qrow["label"]}
        )
    with _pytest.raises(ValueError, match="payload columns .* are not in"):
        ivfpq_build(
            emb.select("vec_id", "embedding"),
            str(tmp_path / "x"),
            payload_cols=("label",),
        )
    with _pytest.raises(ValueError, match="payload columns"):
        ivfpq_build(emb, idx, payload_cols=())  # reuse under other set
    # (c) appends: payload carried; arrival without it refused
    arrivals = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 800_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    with _pytest.raises(ValueError, match="arrival frame lacks"):
        ivfpq_append(spark, idx, arrivals.drop("label"))
    n = ivfpq_append(spark, idx, arrivals)
    assert n == arrivals.count()
    appended = (
        spark.read.parquet(f"{idx}/codes")
        .filter(F.col("vec_id") >= 800_000_000)
        .select("label")
        .collect()
    )
    assert appended and all(r["label"] is not None for r in appended)
    # (d) rebuild preserves the payload set unprompted
    corpus2 = emb.unionByName(arrivals)
    ivfpq_rebuild(spark, idx, corpus2)
    assert _ivfpq_payload_cols(spark, idx) == ("label",)


def test_ivfpq_payload_pre_encoded_append_and_filtered_batch(spark, tmp_path):
    """The two remaining payload surfaces: (a) the screened streaming
    append path — ``pre_encoded`` rows carry no payload (the screen
    encodes (vec_id, cid, codes) only), so ivfpq_append re-attaches
    the layout's payload columns from the arrival frame by id, and
    refuses an arrival frame that lacks them; (b) the batch probe
    accepts the same ``payload_eq`` predicate and every (qid, result)
    row satisfies it."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        _ivfpq_encode_cells,
        ivfpq_append,
        ivfpq_build,
        ivfpq_probe_batch,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "payb")
    ivfpq_build(emb, idx, payload_cols=("label",))
    arrivals = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 800_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    encoded = _ivfpq_encode_cells(spark, idx, arrivals)
    with _pytest.raises(ValueError, match="arrival frame lacks"):
        ivfpq_append(
            spark, idx, arrivals.drop("label"), pre_encoded=encoded
        )
    n = ivfpq_append(spark, idx, arrivals, pre_encoded=encoded)
    assert n == arrivals.count()
    appended = (
        spark.read.parquet(f"{idx}/codes")
        .filter(F.col("vec_id") >= 800_000_000)
        .select("label")
        .collect()
    )
    assert appended and all(r["label"] is not None for r in appended)
    # (b) filtered batch probe
    queries = emb.filter(F.col("vec_id").isin(3, 11)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    lbl = emb.filter(F.col("vec_id") == 3).head()["label"]
    corpus = emb.select("vec_id", "embedding", "label").unionByName(
        arrivals
    )  # the rerank frame must cover the appended ids too
    out = ivfpq_probe_batch(
        spark, idx, queries, corpus, payload_eq={"label": lbl}
    )
    rows = out.join(corpus.select("vec_id", "label"), "vec_id").collect()
    assert rows and all(r["label"] == lbl for r in rows)


def test_payload_filter_none_value_refused(spark, tmp_path):
    """payload_eq={'label': None} compiles to col == NULL — false for
    every row under three-valued logic — so it is refused by name
    instead of returning a silently empty top-k."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        ivfpq_adc_candidates,
        ivfpq_build,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "pnone")
    ivfpq_build(emb, idx, payload_cols=("label",))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    with _pytest.raises(ValueError, match=r"are \(or contain\) None"):
        ivfpq_adc_candidates(spark, idx, q, payload_eq={"label": None})


def test_payload_in_filter_pushed_and_guarded(spark, tmp_path):
    """IN-list filtered search: a collection payload_eq value compiles
    to a parquet In filter INSIDE the cid-pruned codes-only scan (not
    a post-filter), the candidate set honors it exactly, and the
    silent-empty-result shapes are refused by name (empty IN-list;
    None member — three-valued logic would match nothing)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        ivfpq_adc_candidates,
        ivfpq_build,
    )

    from .conftest import SF_DIR
    from .plan_utils import assert_codes_scans_no_embedding, formatted_plan

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "pin")
    ivfpq_build(emb, idx, payload_cols=("label",))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    cand = ivfpq_adc_candidates(
        spark, idx, q, exclude_vec_id=QUERY_VEC_ID,
        payload_eq={"label": [0, 1]},
    )
    plan = formatted_plan(cand)
    assert "In(label" in plan.replace(" ", "")  # pushed, not post-hoc
    assert_codes_scans_no_embedding(plan)
    got = [r["vec_id"] for r in cand.collect()]
    assert got, "IN-filtered candidates must exist on this fixture"
    labels = {
        r["label"]
        for r in emb.filter(F.col("vec_id").isin(got))
        .select("label")
        .collect()
    }
    assert labels <= {0, 1}  # every candidate satisfies the IN-list
    # a set value is accepted (normalized to a sorted list)
    assert (
        ivfpq_adc_candidates(
            spark, idx, q, payload_eq={"label": {0, 1}}
        ).count()
        == cand.count()
    )
    with _pytest.raises(ValueError, match="EMPTY"):
        ivfpq_adc_candidates(spark, idx, q, payload_eq={"label": []})
    with _pytest.raises(ValueError, match="contain"):
        ivfpq_adc_candidates(
            spark, idx, q, payload_eq={"label": [0, None]}
        )


def test_payload_match_cols_per_query_scoping(spark, tmp_path):
    """Per-query filtered batch search: each query's results equal its
    own single filtered probe (N probes, one scan), the union of the
    batch's labels is PUSHED into the scan as an In filter, and the
    refusal surface names absent match columns, queries missing them,
    and NULL query values."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        IVF_BATCH_QIDS,
        _emb,
        ivfpq_batch_candidates,
        ivfpq_build,
        ivfpq_probe,
        ivfpq_probe_batch,
    )

    from .conftest import SF_DIR
    from .plan_utils import formatted_plan

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "pmatch")
    ivfpq_build(emb, idx, payload_cols=("label",))
    queries = emb.filter(
        F.col("vec_id").isin(list(IVF_BATCH_QIDS))
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        "label",
    )
    batch = ivfpq_probe_batch(
        spark, idx, queries, emb, payload_match_cols=("label",)
    )
    rows = batch.collect()
    got = {}
    for r in rows:
        got.setdefault(r["qid"], []).append((r["vec_id"], r["cos_sim"]))
    for qrow in queries.collect():
        qid, lbl = qrow["qid"], qrow["label"]
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qe")
        )
        single = [
            (r["vec_id"], r["cos_sim"])
            for r in ivfpq_probe(
                spark, idx, q, emb,
                exclude_vec_id=qid,
                payload_eq={"label": lbl},
            ).collect()
        ]
        assert got.get(qid, []) == single, qid
    # the union-of-labels In filter reaches the scan
    plan = formatted_plan(
        ivfpq_batch_candidates(
            spark, idx, queries, payload_match_cols=("label",)
        )
    )
    assert "In(label" in plan.replace(" ", "")
    # refusals by name
    with _pytest.raises(ValueError, match="not payloads"):
        ivfpq_probe_batch(
            spark, idx, queries, emb, payload_match_cols=("nope",)
        )
    with _pytest.raises(ValueError, match="absent from the QUERIES"):
        ivfpq_probe_batch(
            spark,
            idx,
            queries.drop("label"),
            emb,
            payload_match_cols=("label",),
        )
    with _pytest.raises(ValueError, match="NULL in match column"):
        ivfpq_probe_batch(
            spark,
            idx,
            queries.withColumn(
                "label",
                F.when(F.col("qid") == 0, F.lit(None)).otherwise(
                    F.col("label")
                ),
            ),
            emb,
            payload_match_cols=("label",),
        )


def test_ivf_knn_graph_contract(spark, tmp_path):
    """The kNN graph entry: per-vector neighbor lists are cell-scoped,
    rk is dense 1..min(k, cell_size-1) with the shared (cos desc,
    nb_id asc) tie-break, singleton-cell vectors are absent (not an
    error), and the oversized-cell refusal fires eagerly by name with
    the sdc_nlist_for remedy before any graph job runs."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.ivf_build(emb, str(tmp_path / "knn-ivf"))
    g = V.ivf_knn_graph(spark, idx).collect()
    assert len(g) > 0
    per_vec: dict = {}
    for r in g:
        per_vec.setdefault(r["vec_id"], []).append(r)
    asg = {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(f"{idx}/assignment")
        .select("vec_id", "cid")
        .collect()
    }
    cell_sizes: dict = {}
    for cid in asg.values():
        cell_sizes[cid] = cell_sizes.get(cid, 0) + 1
    for vid, rows in per_vec.items():
        rows.sort(key=lambda r: r["rk"])
        want = min(V.KNN_GRAPH_K, cell_sizes[asg[vid]] - 1)
        assert [r["rk"] for r in rows] == list(range(1, want + 1))
        # neighbors really are same-cell, ordered by (cos desc, nb_id)
        for r in rows:
            assert asg[r["nb_id"]] == asg[vid]
        keys = [(-r["cos_sim"], r["nb_id"]) for r in rows]
        assert keys == sorted(keys)
    # every vector with a same-cell companion is present; singletons
    # are absent by contract
    with_company = {v for v, c in asg.items() if cell_sizes[c] > 1}
    assert set(per_vec) == with_company
    # neighbor lists are exact within the cell: the rank-1 neighbor is
    # the true cosine argmax among same-cell vectors (spot-check the
    # first three graph vectors)
    embs = {
        r["vec_id"]: r["embedding"]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    for vid in sorted(per_vec)[:3]:
        mates = [u for u in with_company if u != vid and asg[u] == asg[vid]]
        best = max(
            mates, key=lambda u: (round(cos(embs[vid], embs[u]), 6), -u)
        )
        assert per_vec[vid][0]["nb_id"] == best
    # eager refusal names the offending volume and the re-gear remedy
    with _pytest.raises(ValueError, match="sdc_nlist_for"):
        V.ivf_knn_graph(spark, idx, max_cell_pairs=1)


def test_ivfpq_knn_graph_codes_only_and_recall(spark, tmp_path):
    """The codes-only kNN graph: (a) its pair stage reads NO float
    column (the 100 TB promise — 16 bytes/vector, plan-asserted), (b)
    the per-vector cut is a WindowGroupLimit (map-side pruning before
    the exchange), (c) SDC neighbor ranks agree with the exact-cosine
    graph over the same cells — for most vectors the SDC rank-1
    neighbor appears in the exact top-k (quantization reorders the
    tail, not the head), and (d) the oversized-cell refusal guards the
    pair space by name."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR
    from .plan_utils import assert_codes_scans_no_embedding, formatted_plan

    base = V._emb(spark, SF_DIR)
    # planted twins: byte-identical copies of ids 0..9 — the pairs a
    # dedup/diversity consumer of the graph must see at rank 1
    twins = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    emb = base.unionByName(twins).localCheckpoint(eager=True)
    ivf_dir = str(tmp_path / "g-ivf")
    idx = V.ivfpq_build(
        emb,
        str(tmp_path / "g-ivfpq"),
        ivf_dir=ivf_dir,
        pq_dir=str(tmp_path / "g-pq"),
    )
    g = V.ivfpq_knn_graph(spark, idx)
    plan = formatted_plan(g)
    assert_codes_scans_no_embedding(plan)
    exec_plan = g._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in exec_plan
    rows = g.collect()
    assert len(rows) > 0
    sdc_top1 = {
        r["vec_id"]: (r["nb_id"], r["sdc_micro"])
        for r in rows
        if r["rk"] == 1
    }
    # every planted twin pair finds its copy at rank 1, SDC exactly 0
    # (byte-identical codes) — in BOTH orientations
    for i in range(10):
        assert sdc_top1[i] == (i + 900_000, 0)
        assert sdc_top1[i + 900_000] == (i, 0)
    # participants equal the exact graph's (same cells, same
    # companionship); head agreement with exact cosine is PARTIAL by
    # design — quantized distances reorder a tight cell's near-uniform
    # interior (measured 0.38 rank-1 containment in exact top-3 on
    # the un-planted fixture) — so the gate here is the dedup property
    # above, not rank fidelity
    exact_vecs = {
        r["vec_id"] for r in V.ivf_knn_graph(spark, ivf_dir).collect()
    }
    assert set(sdc_top1) == exact_vecs
    with _pytest.raises(ValueError, match="sdc_nlist_for"):
        V.ivfpq_knn_graph(spark, idx, max_cell_pairs=1)


def test_ivfpq_knn_graph_exact_refinement(spark, tmp_path):
    """The exact rerank of the codes-only graph recovers the rank
    fidelity the raw SDC head gives up: (a) its rank-1 neighbor lands
    in the exact-cosine graph's top-k for the large majority of
    vectors, FAR above the raw SDC head's containment (measured 0.922
    vs 0.38 on this fixture), because the exact top-k hides inside the
    SDC top-KNN_RERANK_CAND even where quantization reorders the head;
    (b) planted byte-twins rerank to rank 1 at cosine exactly 1.0; (c)
    participants equal the exact graph's (rerank never drops a
    vertex); (d) rk is dense and bounded; (e) a rerank corpus missing
    candidate ids is refused by name — never a silently shorter
    neighbor list."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    base = V._emb(spark, SF_DIR)
    twins = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    emb = base.unionByName(twins).localCheckpoint(eager=True)
    ivf_dir = str(tmp_path / "rg-ivf")
    idx = V.ivfpq_build(
        emb,
        str(tmp_path / "rg-ivfpq"),
        ivf_dir=ivf_dir,
        pq_dir=str(tmp_path / "rg-pq"),
    )
    exact_sets: dict = {}
    for r in V.ivf_knn_graph(spark, ivf_dir).collect():
        exact_sets.setdefault(r["vec_id"], set()).add(r["nb_id"])
    sdc_top1 = {
        r["vec_id"]: r["nb_id"]
        for r in V.ivfpq_knn_graph(spark, idx).collect()
        if r["rk"] == 1
    }
    rows = V.ivfpq_knn_graph_exact(spark, idx, emb).collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["vec_id"], []).append(r)
    # (c) + (d)
    assert set(per) == set(exact_sets)
    for rs in per.values():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= V.KNN_GRAPH_K
        keys = [(-r["cos_sim"], r["nb_id"]) for r in rs]
        assert keys == sorted(keys)
    # (b) twins lead each other's lists at exact cosine 1.0
    for i in range(10):
        assert per[i][0]["nb_id"] == i + 900_000
        assert per[i][0]["cos_sim"] == 1.0
        assert per[i + 900_000][0]["nb_id"] == i
    # (a) containment, reranked vs raw SDC head
    n = len(exact_sets)
    rer_hit = sum(
        1 for v, rs in per.items() if rs[0]["nb_id"] in exact_sets[v]
    )
    sdc_hit = sum(
        1 for v, nb in sdc_top1.items() if nb in exact_sets[v]
    )
    assert rer_hit / n >= 0.85, (rer_hit, n)
    assert rer_hit / n >= sdc_hit / n + 0.3, (rer_hit, sdc_hit, n)
    # (e) an incomplete rerank corpus is refused by name
    with _pytest.raises(ValueError, match="missing from the rerank"):
        V.ivfpq_knn_graph_exact(
            spark, idx, emb.filter(F.col("vec_id") < 100)
        )
    # (f) a DUPLICATED rerank corpus is refused too — a fanned-out
    # join would let one neighbor occupy several ranks silently
    with _pytest.raises(ValueError, match="duplicate vec_id"):
        V.ivfpq_knn_graph_exact(
            spark, idx, emb.unionByName(emb.limit(5))
        )


def test_ivf_knn_graph_spill_boundary_repair(spark, tmp_path):
    """The spilled graph repairs Voronoi boundary edge-loss: (a) its
    candidate set is a strict superset of the cell-scoped graph's, so
    no vertex's rank-1 cosine can regress and every cell-scoped
    participant stays in the graph; (b) a substantial fraction of
    vectors find a strictly NEARER rank-1 neighbor through their
    second cell (measured 0.58 on this fixture — boundary loss is the
    dominant error mode of the cell-scoped form); (c) spilled rank-1
    membership equals the persisted assignment cell for every vector
    (the graph's spill scoring can never disagree with the layout);
    (d) the oversized-cell refusal gates the SPILLED occupancy and
    names the ivf_rebuild remedy; (e) the plan keeps the equi-join
    shape — no cartesian product — and cuts per-vertex map-side via
    WindowGroupLimit."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = str(tmp_path / "spill-ivf")
    V.ivf_build(emb, idx)
    base = {
        r["vec_id"]: r["cos_sim"]
        for r in V.ivf_knn_graph(spark, idx).collect()
        if r["rk"] == 1
    }
    g = V.ivf_knn_graph(spark, idx, spill=2)
    exec_plan = g._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in exec_plan
    assert "CartesianProduct" not in exec_plan
    sp = {
        r["vec_id"]: r["cos_sim"] for r in g.collect() if r["rk"] == 1
    }
    # (a) superset participants, no regressed head
    assert set(base) <= set(sp)
    assert all(sp[v] >= base[v] for v in base)
    # (b) boundary repair actually fires
    imp = sum(1 for v in base if sp[v] > base[v])
    assert imp / len(base) >= 0.3, (imp, len(base))
    # (c) spilled rank-1 == the persisted assignment cell
    import os

    cent = spark.read.parquet(os.path.join(idx, "centroids"))
    e = spark.read.parquet(os.path.join(idx, "assignment"))
    memb = V._ivf_spill_assign(
        e.select("vec_id", "embedding"), cent, 1
    )
    persisted = {r["vec_id"]: r["cid"] for r in e.select("vec_id", "cid").collect()}
    for r in memb.collect():
        assert persisted[r["vec_id"]] == r["cell"]
    # (d) refusal over the spilled occupancy, ivf_rebuild remedy; the
    # stated corpus size is the TRUE row count, not the spill-times
    # multi-counted membership sum
    n_corpus = emb.count()
    with _pytest.raises(
        ValueError,
        match=rf"ivf_rebuild.*|its current {n_corpus} vectors",
    ) as ei:
        V.ivf_knn_graph(spark, idx, spill=2, max_cell_pairs=1)
    assert f"its current {n_corpus} vectors" in str(ei.value)
    assert "ivf_rebuild" in str(ei.value)


def test_sdc_knn_new_contract(spark, tmp_path):
    """The incremental neighbor lists: exact-copy arrivals rank their
    source first at SDC 0; an arrival landing in a cell with no
    indexed vectors is absent (not an error); rk is dense per arrival;
    the incremental-product refusal names the batch-split remedy."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.ivfpq_build(
        emb,
        str(tmp_path / "iknn"),
        ivf_dir=str(tmp_path / "iknn-ivf"),
        pq_dir=str(tmp_path / "iknn-pq"),
    )
    arrivals = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    rows = V.sdc_knn_new(spark, idx, arrivals).collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["new_vec"], []).append(r)
    assert set(per) == {i + 1_000_000 for i in range(5)}
    for nv, rs in per.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= V.KNN_GRAPH_K
        # the copy's source leads its list at distance exactly 0
        assert rs[0]["nb_id"] == nv - 1_000_000
        assert rs[0]["sdc_micro"] == 0
        keys = [(r["sdc_micro"], r["nb_id"]) for r in rs]
        assert keys == sorted(keys)
    with _pytest.raises(ValueError, match="split the arrival batch"):
        V.sdc_knn_new(spark, idx, arrivals, max_cell_pairs=1)


def test_knn_graph_persisted_lifecycle(spark, tmp_path):
    """The persisted graph layout: (a) build materializes exactly the
    codes-only graph and a re-build call reuses the valid layout; (b)
    arrival lists fold in schema-aligned under the persisted k, copies
    rank their source first at SDC 0, and a replayed append writes
    nothing; (c) the staleness report is metadata-cheap truth — zero
    growth right after build, the appended fraction once the index
    grows, and the rebuild cue past the warn threshold."""
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V
    from realtime_gmall_flink_spark.streaming import vector_ingest as VI

    from .conftest import SF_DIR

    emb = V._emb(spark, SF_DIR)
    idx = V.ivfpq_build(
        emb,
        str(tmp_path / "pg-ivfpq"),
        ivf_dir=str(tmp_path / "pg-ivf"),
        pq_dir=str(tmp_path / "pg-pq"),
    )
    gdir = str(tmp_path / "pg-graph")
    assert V.knn_graph_build(spark, idx, gdir) == gdir
    direct = {
        (r["vec_id"], r["rk"]): (r["nb_id"], r["sdc_micro"])
        for r in V.ivfpq_knn_graph(spark, idx).collect()
    }
    stored = {
        (r["vec_id"], r["rk"]): (r["nb_id"], r["sdc_micro"])
        for r in V.read_knn_graph(spark, gdir).collect()
    }
    assert stored == direct
    # (a) reuse: same dir back, lists untouched
    assert V.knn_graph_build(spark, idx, gdir) == gdir
    assert V.read_knn_graph(spark, gdir).count() == len(stored)

    # (c) zero growth right after build
    rep = V.knn_graph_staleness(spark, idx, gdir)
    assert rep["appended"] == 0 and rep["growth"] == 0.0
    assert not rep["rebuild_recommended"]
    assert rep["n_list_rows"] == len(stored)

    # (b) arrival lists BEFORE the index append (the knn_out ordering)
    arrivals = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 700000).alias("vec_id"), "embedding"
    )
    n = V.knn_graph_append_new(spark, idx, gdir, arrivals)
    assert n > 0
    g2 = V.read_knn_graph(spark, gdir)
    new_top1 = {
        r["vec_id"]: (r["nb_id"], r["sdc_micro"])
        for r in g2.filter(F.col("vec_id") >= 700000).collect()
        if r["rk"] == 1
    }
    assert new_top1 == {
        i + 700000: (i, 0) for i in range(5)
    }  # copies lead with their source at SDC 0
    # replayed append: nothing new
    assert V.knn_graph_append_new(spark, idx, gdir, arrivals) == 0
    assert V.read_knn_graph(spark, gdir).count() == g2.count()

    # (c) growth after the index actually absorbs the arrivals
    V.ivfpq_append(spark, idx, arrivals)
    rep2 = V.knn_graph_staleness(spark, idx, gdir)
    assert rep2["appended"] == rep2["delta"] == 5
    assert 0 < rep2["growth"] < 0.5
    assert not rep2["rebuild_recommended"]
    assert V.knn_graph_staleness(
        spark, idx, gdir, growth_warn=0.001
    )["rebuild_recommended"]

    # (d) a reused layout under a DIFFERENT k is refused by name,
    # and knn_graph_rebuild is the working remedy: it re-materializes
    # under the current index (growth resets to zero) and honors the
    # persisted k when none is given
    import pytest as _pytest

    with _pytest.raises(ValueError, match="knn_graph_rebuild"):
        V.knn_graph_build(spark, idx, gdir, k=5)
    V.knn_graph_rebuild(spark, idx, gdir)
    rep3 = V.knn_graph_staleness(spark, idx, gdir)
    assert rep3["growth"] == 0.0 and rep3["k"] == V.KNN_GRAPH_K
    # rebuilt bulk covers the appended arrivals as full vertices now
    assert (
        V.read_knn_graph(spark, gdir)
        .filter(F.col("vec_id") >= 700000)
        .select("vec_id")
        .distinct()
        .count()
        == 5
    )

    # (e) SHRINKAGE cues a rebuild too: meta says the graph was built
    # over more rows than the index now holds
    from realtime_gmall_flink_spark.indexutil import update_index_meta

    update_index_meta(
        spark, gdir, {"n_source": rep3["n_index_now"] * 4}
    )
    shrunk = V.knn_graph_staleness(spark, idx, gdir)
    assert shrunk["delta"] < 0 and shrunk["appended"] == 0
    assert shrunk["growth"] > 0.5 and shrunk["rebuild_recommended"]


def test_knn_diversity_prune_invariants(spark):
    """The keep-one-of-near-pairs prune: (a) counts partition every
    label (kept + dropped == total) and the prune is exercised at the
    fixture threshold (some drops, never all); (b) the smallest id of
    any near-pair always survives — a dropped vector must have a
    SMALLER kept-or-dropped neighbor at >= the threshold, and no
    vector is dropped because of a larger one; (c) the rule is local:
    every dropped vector has a concrete graph witness."""
    from pyspark.sql import functions as F

    import realtime_gmall_flink_spark.plans.vectors as V

    from .conftest import SF_DIR

    stats = V.knn_diversity_prune(spark, SF_DIR).collect()
    assert all(
        r["n_kept"] + r["n_dropped"] == r["n_total"] for r in stats
    )
    total_dropped = sum(r["n_dropped"] for r in stats)
    total = sum(r["n_total"] for r in stats)
    assert 0 < total_dropped < total

    idx = V.ivf_index_dir(SF_DIR)
    g = V.ivf_knn_graph(spark, idx).collect()
    tight = {}
    for r in g:
        if r["cos_sim"] >= V.KNN_PRUNE_COS:
            tight.setdefault(r["vec_id"], set()).add(r["nb_id"])
    dropped = {
        v for v, nbs in tight.items() if any(nb < v for nb in nbs)
    }
    assert len(dropped) == total_dropped
    # (b)+(c): every dropped vector has a smaller tight witness, and
    # the smallest member of any tight group is never dropped
    for v in dropped:
        assert any(nb < v for nb in tight[v])
    smallest_of_groups = {
        v for v, nbs in tight.items() if all(nb > v for nb in nbs)
    }
    assert smallest_of_groups.isdisjoint(dropped)
