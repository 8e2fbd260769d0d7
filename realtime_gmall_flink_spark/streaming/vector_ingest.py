"""Streaming embedding ingest: score-on-arrival against a persisted IVF
index (the probe-side twin of plans/vectors.ivf_build).

New embedding rows arriving on a file stream get, in-stream and
stateless (append-safe):
- their sign-LSH fingerprint (``bucket`` — the multi-probe layout key);
- their IVF cell assignment (``cid``) against the PERSISTED centroids —
  the same per-row argmax over a broadcast centroid array as the batch
  assignment (plans/vectors.ivf_assign), so an ingested row lands in
  exactly the cell a full index rebuild would give it.

A foreachBatch near-dup check then joins each micro-batch against the
persisted assignment ON the cell id — candidates are same-cell only,
so the check reads the batch's touched cells, never the corpus — and
writes (new_vec, dup_of, cos_sim) pairs over the threshold to a
``near_dups/batch=<id>`` side output (per-batch overwrite dirs: a
replayed batch replaces its own rows, the log-fanout replay pattern).
Scored rows land in ``scored/batch=<id>`` the same way.

Scale: the centroid array is k rows broadcast once; per micro-batch
work is one map-side assignment plus one cid-equi-join whose index side
is partition-pruned by the batch's cell set; no state, no shuffle of
the arriving vectors.
"""

from __future__ import annotations

from ..indexutil import read_layout as _read_layout  # noqa: E402

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity, sign_lsh_bucket
from ..plans.vectors import ANN_BITS, COSINE_DUP_THRESHOLD, ivf_assign


def score_embedding_stream(
    stream: DataFrame, cent: DataFrame, bits: int = ANN_BITS
) -> DataFrame:
    """Stateless in-stream scoring: cell assignment against the (batch)
    centroid table + sign-LSH bucket. Works identically on a batch
    DataFrame — the parity tests run both forms."""
    assigned = ivf_assign(stream, cent)
    return assigned.withColumn(
        "bucket",
        sign_lsh_bucket(F.col("embedding"), bits=bits).cast("int"),
    )


def run_embedding_ingest(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    out_dir: str,
    ckpt: str,
    threshold: float = COSINE_DUP_THRESHOLD,
):
    """Start the availableNow ingest over ``src_dir`` (a parquet topic
    dir of (vec_id, embedding, ...) rows) against the persisted index at
    ``index_dir``. Returns the started query."""
    from .sources import parquet_topic_ingest

    base = _read_layout(spark, os.path.join(index_dir, "assignment"))
    cent = _read_layout(spark, os.path.join(index_dir, "centroids"))
    scored_dir = os.path.join(out_dir, "scored")
    dup_dir = os.path.join(out_dir, "near_dups")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)  # score once, use twice
        batch.write.mode("overwrite").parquet(
            os.path.join(scored_dir, f"batch={batch_id}")
        )
        # the batch's touched cells as LITERALS (one aggregate-sized
        # collect): dynamic pruning can't fire from an un-filtered
        # stream side, so without this the join scans the ENTIRE
        # cid-partitioned assignment every micro-batch
        cells = [
            r["cid"]
            for r in batch.select("cid").distinct().collect()
        ]
        if not cells:
            return
        cos = cosine_similarity(F.col("n.embedding"), F.col("b.embedding"))
        pairs = (
            batch.alias("n")
            .join(
                base.filter(F.col("cid").isin(cells)).alias("b"),
                F.col("n.cid") == F.col("b.cid"),
            )
            .filter(F.col("n.vec_id") != F.col("b.vec_id"))
            .withColumn("__cos", cos)
            .filter(F.col("__cos") >= threshold)
            .select(
                F.col("n.vec_id").alias("new_vec"),
                F.col("b.vec_id").alias("dup_of"),
                F.round("__cos", 6).alias("cos_sim"),
            )
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(dup_dir, f"batch={batch_id}")
        )

    return parquet_topic_ingest(
        spark,
        src_dir,
        ckpt,
        sink,
        transform=lambda stream: score_embedding_stream(
            stream.select("vec_id", "embedding"), cent
        ),
    )


def read_scored(
    spark: SparkSession, out_dir: str, keep_batch: bool = False
) -> DataFrame:
    df = _read_layout(spark, os.path.join(out_dir, "scored"))
    return df if keep_batch else df.drop("batch")


def read_near_dups(spark: SparkSession, out_dir: str) -> DataFrame | None:
    from ..indexutil import read_batched

    return read_batched(spark, out_dir, "near_dups")


def append_scored_to_index(
    spark: SparkSession, index_dir: str, out_dir: str
) -> int:
    """The maintenance step completing ingest -> index (build-once/
    append-many): fold the ingest's scored rows into the persisted
    cid-partitioned assignment so future probes (and future ingests'
    near-dup checks) see them through the same pruned scan. IDEMPOTENT:
    vec_ids already present in the assignment are anti-joined away, so
    a re-run after a crash (or overlapping scored/ batches) appends
    nothing twice. Run in a stopped-writer window, like compaction —
    the ingest query must not be mid-trigger (parquet appends are not
    transactional; on a lakehouse table this is a plain MERGE).
    Returns rows appended."""
    asg = os.path.join(index_dir, "assignment")
    # dropDuplicates: the same vec_id can sit in TWO scored/batch dirs
    # (at-least-once arrival before any maintenance run) — the
    # assignment anti-join alone would append it twice
    scored = (
        read_scored(spark, out_dir)
        .select("vec_id", "embedding", "cid")
        .dropDuplicates(["vec_id"])
    )
    existing = _read_layout(spark, asg).select("vec_id")
    # localCheckpoint severs lineage BEFORE the append: the write must
    # not re-scan the very directory it is appending into
    fresh = scored.join(existing, "vec_id", "left_anti").localCheckpoint(
        eager=True
    )
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("cid").parquet(asg)
    return n


def append_scored_to_sq8(
    spark: SparkSession, sq8_dir: str, out_dir: str
) -> int:
    """Fold the ingest's scored rows into a persisted SQ8 index too —
    the same ingest run can maintain the IVF assignment (probe recall)
    AND the compact-codes sweep path. Delegates to sq8_append, so the
    idempotence contract (dropDuplicates + anti-join on persisted ids)
    and the clamp-on-out-of-range semantics are exactly the batch
    append's. Stopped-writer window; returns rows appended."""
    from ..plans.vectors import sq8_append

    scored = read_scored(spark, out_dir).select("vec_id", "embedding")
    return sq8_append(spark, sq8_dir, scored)


def append_scored_to_pq(
    spark: SparkSession,
    pq_dir: str,
    out_dir: str,
    screen: bool = True,
    max_adc: int | None = None,
) -> int:
    """Fold the ingest's scored rows into a persisted PQ index — the
    ADC sweep path sees arrivals through the same 16-byte codes scan as
    the build corpus. By DEFAULT the batch is ADC-screened first
    (pq_adc_near_dups — codes-only, one scan) and arrivals flagged as
    near-duplicates of already-indexed rows are NOT appended: a dedup
    pipeline must not index the copies it exists to catch. Pass
    ``screen=False`` for the raw append (everything lands), or
    ``max_adc`` to override the threshold — calibrate it per index
    with pq_adc_calibrate (the residual floor is geometry-dependent).
    Delegates to pq_append, so the idempotence contract
    (dropDuplicates + anti-join on persisted ids) and the
    encode-against-frozen-codebooks semantics are exactly the batch
    append's (pq_drift is the rebuild cue). Stopped-writer window;
    returns rows appended (post-screen)."""
    from ..plans.vectors import pq_adc_near_dups, pq_append

    if not screen:
        # raw path: delegate untouched — pq_append's skinny-id
        # anti-join makes a fully-replayed run cost an id comparison
        return pq_append(
            spark,
            pq_dir,
            read_scored(spark, out_dir).select("vec_id", "embedding"),
        )
    existing = _read_layout(spark, os.path.join(pq_dir, "codes")).select(
        "vec_id"
    )
    decided_dir = os.path.join(out_dir, "screened_pq")
    fresh, decided_ids = _fresh_unique_arrivals(
        spark, out_dir, existing, _read_decided(spark, decided_dir)
    )
    if fresh.count() == 0:
        # new ids may still have been RESOLVED (all exact-copy drops):
        # record them or every later run re-pays their collapse
        if not decided_ids.isEmpty():
            _record_decided(spark, decided_dir, decided_ids)
        return 0
    kw = {} if max_adc is None else {"max_adc": max_adc}
    dups = (
        pq_adc_near_dups(spark, pq_dir, fresh, **kw)
        .select(F.col("new_vec").alias("vec_id"))
        .distinct()
    )
    n = pq_append(spark, pq_dir, fresh.join(dups, "vec_id", "left_anti"))
    _record_decided(spark, decided_dir, decided_ids)
    return n


def _dedup_identical_embeddings(batch: DataFrame) -> DataFrame:
    """Collapse rows carrying byte-identical embeddings to ONE
    deterministic survivor (the smallest vec_id) — the intra-batch
    half of the pre-append dedup screens, which otherwise only compare
    arrivals against already-indexed rows. Exact equality only: it
    needs no index, no threshold, and no quantization."""
    from pyspark.sql import Window

    w = Window.partitionBy("embedding").orderBy(F.col("vec_id").asc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _read_decided(spark: SparkSession, path: str) -> DataFrame | None:
    """Ids a previous screened maintenance run RESOLVED (appended or
    dropped) — the sticky memory that keeps a dup-heavy history from
    re-encoding/re-screening its all-time dropped set on every run.
    None when no run recorded decisions yet."""
    if not os.path.isdir(path):
        return None
    return _read_layout(spark, path).select("vec_id").distinct()


def _record_decided(
    spark: SparkSession, path: str, ids: DataFrame
) -> None:
    """Append this run's resolved ids (AFTER the index append — a
    crash between the two merely re-screens them once). Decisions are
    STICKY: a dropped duplicate is never reconsidered, even if the
    operator later loosens the threshold — delete the directory to
    re-screen history."""
    ids.select("vec_id").distinct().write.mode("append").parquet(path)


def _append_knn_lists(
    spark: SparkSession,
    ivfpq_dir: str,
    knn_out: str,
    arrivals: DataFrame,
    pre_encoded: DataFrame | None = None,
    pre_scored: DataFrame | None = None,
) -> int:
    """Persist per-arrival neighbor lists (plans/vectors.sdc_knn_new —
    (new_vec, nb_id, sdc_micro, rk)) for arrivals not already
    recorded, keeping the corpus graph incrementally current without
    re-running the bulk pair stage. MUST run BEFORE the batch lands
    in the index: lists score arrivals against INDEXED rows (the
    sdc_knn_new contract), and the lists-then-append order is what
    makes a crash between the two heal on replay — the arrival is
    still fresh (absent from codes/), its lists anti-join away as
    already written, and the append resumes; the reverse order would
    strand an appended arrival with no lists forever. ``pre_scored``
    hands over an already-computed unfiltered scored pair space
    (the _sdc_scored_new_pairs output over a superset of
    ``arrivals``) so the screen and the lists share one touched-cell
    scan. Returns rows written."""
    from ..plans.vectors import KNN_GRAPH_K, _knn_topk_cut, sdc_knn_new

    todo, enc = arrivals, pre_encoded
    if os.path.isdir(knn_out):
        seen = (
            _read_layout(spark, knn_out)
            .select(F.col("new_vec").alias("vec_id"))
            .distinct()
        )
        todo = arrivals.join(seen, "vec_id", "left_anti")
        if enc is not None:
            enc = enc.join(seen, "vec_id", "left_anti")
    if todo.isEmpty():
        return 0
    if pre_scored is not None:
        # the caller already holds the batch's unfiltered scored pair
        # space (the screen computed it) — the lists are just its
        # per-arrival top-k cut, restricted to the arrivals still
        # owed a list; re-scoring it through sdc_knn_new would run
        # the touched-cell codes scan twice per maintenance run
        scored = pre_scored.join(
            todo.select(F.col("vec_id").alias("new_vec")),
            "new_vec",
            "left_semi",
        ).select(
            "new_vec", F.col("dup_of").alias("nb_id"), "sdc_micro"
        )
        lists = _knn_topk_cut(
            scored, "new_vec", "sdc_micro", ascending=True,
            k=KNN_GRAPH_K,
        )
    else:
        lists = sdc_knn_new(spark, ivfpq_dir, todo, pre_encoded=enc)
    lists = lists.localCheckpoint(
        eager=True
    )  # count and write see the same rows
    n = lists.count()
    if n:
        lists.write.mode("append").parquet(knn_out)
    return n


def _fresh_unique_arrivals(
    spark: SparkSession,
    out_dir: str,
    existing: DataFrame,
    decided: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The shared pre-screen reduction of a cumulative scored history
    to GENUINELY NEW, exact-copy-free arrivals, materialized once.
    Returns (fresh, decided_ids): ``fresh`` the rows to screen/append,
    ``decided_ids`` every id resolved by this run (fresh plus the
    exact-copy drops) for the caller to record AFTER its append.
    Stages:

    1. one deterministic row per id over the history, FIRST-WINS by
       batch (matching append semantics: the EARLIEST arrival of an
       id is what the index holds — an arbitrary dropDuplicates pick
       could surface a later re-embedding that was never indexed and
       mis-aim the exact-copy check both ways); ONE history shuffle,
       materialized once and reused by every branch below;
    2. skinny id anti-join — an idle or fully-replayed maintenance
       run exits here, never paying an embedding-keyed shuffle;
    3. intra-batch collapse among the new rows (min-id survivor —
       deterministic because all candidates are new together);
    4. drop any new row byte-identical to an ALREADY-INDEXED one by
       joining against the indexed rows' own history embeddings —
       id-order-independent (a min-id rule would keep a new copy
       whose id happens to sort below the indexed one's), and
       independent of any screen threshold the operator tightened
       below the quantization residual floor. The indexed floats come
       from the scored history itself (they entered through this
       pipeline); rows indexed OUTSIDE the ingest remain the
       threshold screens' job.

    The first-wins pick mirrors what the APPEND paths index under the
    engine's id-immutability contract (duplicate ids with differing
    embeddings are refused at every build surface); a history that
    violates it upstream gets a deterministic resolution here rather
    than a per-run arbitrary one, but mixing raw (screen=False) and
    screened maintenance over such a violating history can still
    index either copy — fix the producer, not the screen."""
    from pyspark.sql import Window

    # ids already RESOLVED (indexed, or dropped by a previous screened
    # run) — the freshness probe and the fresh cut exclude both, but
    # the exact-copy reference below uses only truly INDEXED ids
    known = (
        existing
        if decided is None
        else existing.unionByName(decided)
    )
    scored = read_scored(spark, out_dir, keep_batch=True).select(
        "vec_id", "embedding", "batch"
    )
    empty = scored.select("vec_id", "embedding").limit(0)
    # skinny id-only freshness probe BEFORE any embedding-carrying
    # shuffle: idle/fully-replayed runs exit on a column-pruned
    # distinct + anti-join and never sort the history's float arrays
    if (
        scored.select("vec_id")
        .distinct()
        .join(known, "vec_id", "left_anti")
        .isEmpty()
    ):
        return empty, empty.select("vec_id")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("batch").asc(), F.col("embedding").asc()
    )
    deduped = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    new_rows = deduped.join(known, "vec_id", "left_anti")
    fresh = _dedup_identical_embeddings(new_rows)
    # no distinct() on the anti-join's build side: duplicate right
    # keys don't change left_anti semantics, and the screens keep
    # indexed embeddings near-unique anyway
    indexed_embeddings = deduped.join(
        existing, "vec_id", "left_semi"
    ).select("embedding")
    return (
        fresh.join(
            indexed_embeddings, "embedding", "left_anti"
        ).localCheckpoint(eager=True),
        new_rows.select("vec_id").localCheckpoint(eager=True),
    )


def append_scored_to_ivfpq(
    spark: SparkSession,
    ivfpq_dir: str,
    out_dir: str,
    screen: bool = True,
    max_sdc: int | None = None,
    knn_out: str | None = None,
) -> int:
    """Fold the ingest's scored rows into the persisted composed IVF-PQ
    layout: each arrival is encoded against the frozen codebooks AND
    assigned to its cell against the frozen centroids, landing in the
    cid partition a full rebuild would give it. By DEFAULT the batch
    is SDC-screened first (sdc_score_new — codes-vs-codes inside the
    batch's touched cells, cid-pruned scan, no per-arrival lookup
    table) and near-duplicates of indexed rows are NOT appended; pass
    ``screen=False`` for the raw append or ``max_sdc`` to override the
    threshold. Delegates to ivfpq_append (idempotent). Stopped-writer
    window; returns rows appended (post-screen).

    ``knn_out``: also persist each APPENDED arrival's neighbor list
    (sdc_knn_new against the pre-append index) to that directory —
    the streaming leg of the kNN graph lifecycle, so the corpus graph
    stays incrementally current without re-running the bulk pair
    stage. Lists reuse the screen's ONE encode, are written BEFORE
    the index append (crash between the two heals on replay — see
    _append_knn_lists), and anti-join already-recorded ids so a
    replayed history never duplicates a list. Screened-out
    near-duplicates get no list: they never enter the corpus, and
    their evidence lives in the near_dups side output already."""
    from ..plans.vectors import (
        SDC_DUP_MICRO,
        SDC_MAX_CELL_PAIRS,
        _ivfpq_encode_cells,
        _resolve_sdc_threshold,
        _sdc_score_encoded,
        _sdc_scored_new_pairs,
        ivfpq_append,
    )

    if not screen:
        # raw path: a fully-replayed run costs ivfpq_append's
        # skinny-id anti-join, never an encode — with knn_out the
        # lists' anti-join keeps the full replay encode-free too
        arrivals = read_scored(spark, out_dir).select(
            "vec_id", "embedding"
        )
        if knn_out is None:
            return ivfpq_append(spark, ivfpq_dir, arrivals)
        # lists are for arrivals the index does NOT hold yet: an id
        # already indexed (knn_out enabled after history was appended)
        # would find ITSELF at rank-1 SDC 0 — exclude via the same
        # skinny-id anti-join the append runs, DEDUPED first (the
        # at-least-once scored history may repeat an id; the encode's
        # query-batch guard refuses duplicate qids by name)
        fresh_new = (
            arrivals.dropDuplicates(["vec_id"])
            .join(
                _read_layout(spark, 
                    os.path.join(ivfpq_dir, "codes")
                ).select("vec_id"),
                "vec_id",
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        if fresh_new.isEmpty():
            return 0
        # ONE encode serves lists and append, the screened-path shape
        enc = _ivfpq_encode_cells(spark, ivfpq_dir, fresh_new)
        _append_knn_lists(
            spark, ivfpq_dir, knn_out, fresh_new, pre_encoded=enc
        )
        return ivfpq_append(
            spark, ivfpq_dir, fresh_new, pre_encoded=enc
        )
    # shared reduction: new ids only (keeps the SDC guard's batch-side
    # cell counts equal to actual arrivals — a replayed history cannot
    # inflate batch x indexed past the bound), exact copies collapsed
    # intra-batch AND vs already-indexed rows
    existing = _read_layout(spark, 
        os.path.join(ivfpq_dir, "codes")
    ).select("vec_id")
    decided_dir = os.path.join(out_dir, "screened_ivfpq")
    fresh, decided_ids = _fresh_unique_arrivals(
        spark, out_dir, existing, _read_decided(spark, decided_dir)
    )
    if fresh.count() == 0:
        if not decided_ids.isEmpty():
            _record_decided(spark, decided_dir, decided_ids)
        return 0
    # ONE encode serves the SDC screen, the lists, and the append
    encoded = _ivfpq_encode_cells(spark, ivfpq_dir, fresh)
    # explicit > the layout's calibrated threshold > constant
    threshold = _resolve_sdc_threshold(ivfpq_dir, max_sdc, SDC_DUP_MICRO)
    if knn_out is None:
        scored = None
        dup_pairs = _sdc_score_encoded(
            spark, ivfpq_dir, encoded, threshold, SDC_MAX_CELL_PAIRS
        )
    else:
        # ONE pair-space scoring serves the screen AND the lists —
        # sdc_knn_new here would walk the touched-cell codes scan a
        # second time per maintenance run
        scored = _sdc_scored_new_pairs(
            spark, ivfpq_dir, encoded, SDC_MAX_CELL_PAIRS,
            "sdc_score_new",
        ).localCheckpoint(eager=True)
        dup_pairs = scored.filter(F.col("sdc_micro") <= threshold)
    dups = (
        dup_pairs.select(F.col("new_vec").alias("vec_id")).distinct()
    )
    survivors = fresh.join(dups, "vec_id", "left_anti")
    enc_survivors = encoded.join(dups, "vec_id", "left_anti")
    if knn_out is not None:
        # survivors' neighbor lists BEFORE they land in the index,
        # cut from the screen's scored pair space (see
        # _append_knn_lists for the crash-ordering argument)
        _append_knn_lists(
            spark,
            ivfpq_dir,
            knn_out,
            survivors,
            pre_scored=scored,
        )
    n = ivfpq_append(
        spark,
        ivfpq_dir,
        survivors,
        pre_encoded=enc_survivors,
    )
    _record_decided(spark, decided_dir, decided_ids)
    return n


def screen_scored_against_pq(
    spark: SparkSession,
    pq_dir: str,
    out_dir: str,
    max_adc: int | None = None,
) -> DataFrame:
    """ADC near-dup screening of the ingest's scored rows against a
    persisted PQ index — the codes-only twin of the ingest's exact
    same-cell check: ONE scan of the 16-byte codes for the whole
    batch, no float read (run it BEFORE append_scored_to_pq to decide
    which arrivals are worth indexing). Returns (new_vec, dup_of,
    adc) pairs under the threshold; exact-verify survivors with the
    corpus if certainty is needed (bounded point-fetch)."""
    from ..plans.vectors import pq_adc_near_dups

    scored = (
        read_scored(spark, out_dir)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    # forward the threshold only when the caller supplied one — the
    # default lives in pq_adc_near_dups' signature alone
    kw = {} if max_adc is None else {"max_adc": max_adc}
    return pq_adc_near_dups(spark, pq_dir, scored, **kw)
