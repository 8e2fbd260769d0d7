"""Incremental near-dup scoring for DOCUMENTS — the text twin of
vector_ingest: score NEW documents against a PERSISTED shingle index
instead of recomputing the corpus pair graph.

Index layout (built staged + atomic rename, like the IVF index):
- ``shingles/`` — distinct (doc_id, h) word-k-shingle hashes (8-byte
  xxhash64, the same codegen shingler as plans.textops.jaccard_pairs);
- ``sizes/``    — per-doc distinct shingle count (the Jaccard
  denominator's corpus side);
- ``dfreq/``    — per-hash document frequency, so the probe applies the
  SAME stop-shingle cap (df > max_df dropped before pairing) as the
  batch pair generator;
- ``build_stats/`` — the build-time doc count, so the drift check is a
  scalar compare instead of a shingle-tree scan.

Scoring a batch of new docs is: shingle them (one scan, codegen), join
against the index's cap-filtered shingles on the 8-byte hash, count
intersections per (new, old) pair, and threshold exact Jaccard using
the persisted old-side sizes. The join shuffles on the hash — on a
lakehouse table bucketed by ``h`` the index side is co-located and the
probe shuffles only the (small) new-doc side.

Divergence from a full recompute, pinned on purpose: document
frequencies are BUILD-time (appends don't refresh ``dfreq/``), exactly
like IVF appends assigning against frozen centroids — heavy append
volume warrants a rebuild (the drift story lives with the index
owner). Pairs are new-vs-corpus only; new-vs-new dedup within a batch
is the batch pair generator's job.
"""

from __future__ import annotations

from ..indexutil import read_layout as _read_layout  # noqa: E402

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.textops import (
    JACCARD_MAX_DF,
    JACCARD_THRESHOLD,
    shingle_hashes,
)


def shingle_index_build(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    k: int = 3,
) -> str:
    """Materialize the shingle index for ``docs(doc_id, text)``.
    Staged + renamed (shared scaffolding with the ANN indexes); an
    existing complete index is reused, debris is rebuilt. A LEGACY
    index (pre-build_stats layout) is MIGRATED in place, never treated
    as debris: appended docs live only in the index, so rebuilding
    from ``docs`` would silently drop them."""
    from ..indexutil import staged_index_build

    _backfill_build_stats(docs.sparkSession, index_dir)
    return staged_index_build(
        index_dir, SHINGLE_SUBDIRS, _shingle_write(docs, text_col, k)
    )


SHINGLE_SUBDIRS = ("shingles", "sizes", "dfreq", "build_stats")


def _shingle_write(docs: DataFrame, text_col: str, k: int):
    """The shingle-index materialization closure shared by build and
    rebuild. ``build_stats/`` persists the build-time doc count so
    :func:`shingle_index_drift` is a scalar compare, not a data scan
    (the text twin of the IVF index's build_stats snapshot)."""
    spark = docs.sparkSession

    def write(staging: str) -> None:
        sh_path = os.path.join(staging, "shingles")
        shingle_hashes(
            docs.dropDuplicates(["doc_id"]), text_col, k
        ).write.parquet(sh_path)
        sh = _read_layout(spark, sh_path)
        sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        ).write.parquet(os.path.join(staging, "sizes"))
        sh.groupBy("h").agg(
            F.count(F.lit(1)).alias("df")
        ).write.parquet(os.path.join(staging, "dfreq"))
        n_docs = (
            _read_layout(spark, os.path.join(staging, "sizes")).count()
        )
        spark.createDataFrame(
            [(n_docs,)], "n_docs long"
        ).coalesce(1).write.parquet(os.path.join(staging, "build_stats"))

    return write


def _legacy_build_count(spark: SparkSession, index_dir: str) -> int:
    """Recover a pre-build_stats index's BUILD-time doc population: the
    build docs are exactly those with no shingle unknown to the frozen
    ``dfreq`` (appended docs carry novel shingles). One anti-join of
    the shingles tree against dfreq hashes — reads all shingle hashes,
    the cost the build_stats snapshot exists to avoid."""
    total_now = (
        _read_layout(spark, os.path.join(index_dir, "sizes"))
        .select("doc_id")
        .distinct()
        .count()
    )
    sh = _read_layout(spark, os.path.join(index_dir, "shingles"))
    dfreq = _read_layout(spark, os.path.join(index_dir, "dfreq")).select(
        "h"
    )
    appended = (
        sh.join(dfreq, "h", "left_anti").select("doc_id").distinct().count()
    )
    return total_now - appended


def _backfill_build_stats(spark: SparkSession, index_dir: str) -> bool:
    """Migrate a legacy (pre-build_stats) index IN PLACE: if the three
    original subdirs are complete but ``build_stats/`` is missing,
    persist the recovered build-time doc count so the layout validates
    under SHINGLE_SUBDIRS — without this, staged_index_build would
    treat the whole index as debris and silently rebuild it from the
    caller's docs, DROPPING every appended document. Pays the legacy
    anti-join once (never the cheap sizes count: on an index with
    appends that would overstate the build population and shift the
    drift baseline). Returns True if a migration was performed."""
    legacy = ("shingles", "sizes", "dfreq")
    stats_path = os.path.join(index_dir, "build_stats")
    if os.path.isdir(stats_path) or not all(
        os.path.isdir(os.path.join(index_dir, s)) for s in legacy
    ):
        return False
    n = _legacy_build_count(spark, index_dir)
    spark.createDataFrame([(n,)], "n_docs long").coalesce(1).write.parquet(
        stats_path
    )
    return True


def shingle_index_drift(
    spark: SparkSession,
    index_dir: str,
    growth_warn: float = 0.5,
    frag_warn: int | None = None,
) -> dict:
    """The text twin of ivf_drift: how stale is the frozen ``dfreq/``
    snapshot? ``dfreq`` covers exactly the docs present at build (its
    per-doc universe is the build-time ``sizes`` population, which only
    appends), so drift is the appended fraction: docs added to
    ``sizes/`` since the build. ``rebuild_recommended`` fires past
    ``growth_warn`` — beyond it the viral cap (and with it the
    boilerplate exclusion) reflects a minority of the corpus.

    Cost: against a current-layout index (``build_stats/`` present,
    written at build like the IVF snapshot) this is one doc-sized
    ``sizes`` row count vs a stored scalar — no shingle data is read.
    Against a pre-build_stats index it falls back to recovering the
    build population via a full anti-join of the shingles tree against
    ``dfreq`` — that path reads ALL shingle hashes and at corpus scale
    costs a real scan; rebuild to get the cheap check."""
    total_now = (
        _read_layout(spark, os.path.join(index_dir, "sizes"))
        .select("doc_id")
        .distinct()
        .count()
    )
    stats_path = os.path.join(index_dir, "build_stats")
    if os.path.isdir(stats_path):
        total_build = (
            _read_layout(spark, stats_path).head()["n_docs"]
        )
    else:
        # legacy fallback (pre-build_stats build): recover the build
        # population via the anti-join (see _legacy_build_count — a doc
        # counts as appended if ANY of its shingles is unknown to
        # dfreq; an appended doc composed ONLY of build shingles is
        # indistinguishable from a build doc, and harmlessly so).
        total_build = _legacy_build_count(spark, index_dir)
    appended_docs = total_now - total_build
    growth = (
        appended_docs / total_build if total_build else float("inf")
    )
    # fragmentation cue over the append-heavy subdirs (listdir-only;
    # the vectors-family drift convention): remedy is
    # shingle_index_compact, never a rebuild
    from ..indexutil import FRAG_WARN, layout_fragmentation

    frag_warn = FRAG_WARN if frag_warn is None else frag_warn
    max_files = max(
        layout_fragmentation(os.path.join(index_dir, s))[
            "max_unit_files"
        ]
        for s in ("shingles", "sizes")
    )
    return {
        "total_build": total_build,
        "total_now": total_now,
        "appended_docs": appended_docs,
        "growth": growth,
        "rebuild_recommended": growth > growth_warn,
        "max_unit_files": max_files,
        "compaction_recommended": max_files > frag_warn,
    }


def shingle_index_compact(
    spark: SparkSession, index_dir: str, **kw
) -> dict:
    """Compact the shingle index's two flat append subdirs (one atomic
    whole-subdir swap each — indexutil.compact_layout). Per-hash
    idempotent appends write one file set per call, so a long ingest
    fragments both trees."""
    from ..indexutil import compact_layout

    out = {}
    for s in ("shingles", "sizes"):
        rep = compact_layout(spark, os.path.join(index_dir, s), **kw)
        for k, v in rep.items():
            out[k] = (out.get(k, 0) + v) if k != "rolled_back" else (
                out.get(k, False) or v
            )
    return out


def gram_index_compact(
    spark: SparkSession, index_dir: str, **kw
) -> dict:
    """Compact the gram index's flat occurrence tree (the duplicated-
    span corpus) the same way."""
    from ..indexutil import compact_layout

    return compact_layout(spark, os.path.join(index_dir, "grams"), **kw)


def shingle_index_rebuild(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    k: int = 3,
) -> str:
    """Rebuild the shingle index IN PLACE over ``docs`` with the
    crash-safe two-rename swap — the way the frozen ``dfreq/`` snapshot
    (and the sizes/shingles of removed or edited docs) gets refreshed
    after heavy append volume. Stopped-writer window."""
    from ..indexutil import rebuild_index

    return rebuild_index(
        index_dir, SHINGLE_SUBDIRS, _shingle_write(docs, text_col, k)
    )


def score_new_docs(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int = JACCARD_MAX_DF,
    new_sh: DataFrame | None = None,
) -> DataFrame:
    """(new_doc, dup_of, jaccard) for every new-vs-corpus pair at or
    above ``threshold`` — exact Jaccard over distinct shingles, with
    the build-time stop-shingle cap applied to the corpus side.
    ``new_sh`` lets a caller that already shingled the batch (the
    streaming sink) pass the shared DataFrame instead of recomputing.
    Duplicate doc_ids in the input are dropped before shingling —
    tied positions from a duplicated row would otherwise let the
    shingler's lead() window pair tokens ACROSS the copies."""
    if new_sh is None:
        new_sh = shingle_hashes(
            new_docs.dropDuplicates(["doc_id"]), text_col, k
        )
    new_sizes = new_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # drop only hashes KNOWN viral at build (df > max_df): appended
    # docs' shingles are absent from the frozen dfreq and must stay
    # scoreable — a semi-join on the ok-set would silently exclude
    # every post-build document from matching
    viral = (
        _read_layout(spark, os.path.join(index_dir, "dfreq"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    idx_sh = (
        _read_layout(spark, os.path.join(index_dir, "shingles"))
        .join(viral, "h", "left_anti")
        .select(F.col("doc_id").alias("dup_of"), "h")
    )
    sizes = _read_layout(spark, os.path.join(index_dir, "sizes")).select(
        F.col("doc_id").alias("dup_of"), F.col("n").alias("n_old")
    )
    inter = (
        new_sh.select(F.col("doc_id").alias("new_doc"), "h")
        .join(idx_sh, "h")
        .groupBy("new_doc", "dup_of")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = F.col("inter") / (
        F.col("n_new") + F.col("n_old") - F.col("inter")
    )
    return (
        inter.join(
            new_sizes.select(F.col("doc_id").alias("new_doc"), "n_new"),
            "new_doc",
        )
        .join(sizes, "dup_of")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc", "dup_of", F.round("jaccard", 6).alias("jaccard"))
    )


def append_docs_to_index(
    spark: SparkSession, index_dir: str, new_docs: DataFrame,
    text_col: str = "text", k: int = 3,
) -> int:
    """Idempotently fold new documents into the index (doc_ids already
    present are skipped): appends their shingles and sizes so FUTURE
    batches score against them too. ``dfreq/`` is deliberately left at
    its build snapshot (see module docstring). Stopped-writer window,
    like every parquet append here. Returns docs appended.

    Crash protocol: the dedup key is ``shingles/`` (the FIRST write),
    so a retry can never append a doc's shingles twice; the dependent
    ``sizes/`` rows are then REPAIRED from the persisted shingles —
    docs present in shingles but missing from sizes (this call's fresh
    docs, or a prior call that crashed between its two appends) get
    their size rows recomputed and appended.

    The shingle append itself is ``repartition("doc_id")``-ed before
    the write so ALL of a doc's shingle rows land in one task — i.e.
    one part file. Spark's job commit promotes task files one rename
    at a time, so a crash mid-commit persists a subset of FILES; with
    whole-doc files that is a subset of whole DOCS, never a doc's
    partial shingle set. The doc-presence dedup therefore stays sound
    at every kill point (a half-committed doc cannot be anti-joined
    away with an undercounted denominator), and every crash window
    converges on the next run. The extra shuffle touches only the new
    batch, not the index."""
    sizes_path = os.path.join(index_dir, "sizes")
    sh_path = os.path.join(index_dir, "shingles")
    indexed = (
        _read_layout(spark, sh_path).select("doc_id").distinct()
    )
    fresh_docs = new_docs.dropDuplicates(["doc_id"]).join(
        indexed, "doc_id", "left_anti"
    )
    sh = shingle_hashes(fresh_docs, text_col, k).localCheckpoint(
        eager=True  # sever lineage: the write must not re-scan the index
    )
    n = sh.select("doc_id").distinct().count()
    if n:
        # maxRecordsPerFile pinned to 0 (unlimited): a session-level
        # spark.sql.files.maxRecordsPerFile would split one task's
        # partition across files at arbitrary ROW boundaries, breaking
        # the whole-doc-per-file invariant the crash protocol rests on
        (
            sh.repartition("doc_id")
            .write.mode("append")
            .option("maxRecordsPerFile", 0)
            .parquet(sh_path)
        )
    # sizes repair: recompute from the persisted shingles for any doc
    # missing a size row (covers this call AND heals crashed priors)
    sized = _read_layout(spark, sizes_path).select("doc_id")
    missing_sizes = (
        _read_layout(spark, sh_path)
        .join(sized, "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    if missing_sizes.count():
        missing_sizes.write.mode("append").parquet(sizes_path)
    return n


def run_doc_ingest(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    out_dir: str,
    ckpt: str,
    threshold: float = JACCARD_THRESHOLD,
    gram_index_dir: str | None = None,
):
    """availableNow ingest over a parquet topic dir of (doc_id, text)
    rows: each micro-batch is scored against the persisted index;
    per-batch overwrite side outputs (the replay-safe log-fanout
    pattern) — ``scored/batch=N`` carries (doc_id, n_shingles),
    ``near_dups/batch=N`` the over-threshold pairs, and (when
    ``gram_index_dir`` points at a gram index) ``copied_spans/batch=N``
    the per-doc copied-span report vs the gram corpus."""
    from .sources import parquet_topic_ingest

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = (
            batch.select("doc_id", "text")
            .dropDuplicates(["doc_id"])
            .localCheckpoint(eager=True)
        )
        # shingle ONCE, share between the audit output and the scorer
        sh = shingle_hashes(batch, "text", 3).localCheckpoint(eager=True)
        counts = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
        # left join so docs too short to shingle (< k words) still get
        # an audit row (n_shingles = 0) — every arrival is recorded
        (
            batch.select("doc_id")
            .join(counts, "doc_id", "left")
            .na.fill(0, ["n_shingles"])
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "scored", f"batch={batch_id}"))
        )
        score_new_docs(
            spark, index_dir, batch, threshold=threshold, new_sh=sh
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "near_dups", f"batch={batch_id}")
        )
        if gram_index_dir is not None:
            score_new_docs_spans(
                spark, gram_index_dir, batch
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, "copied_spans", f"batch={batch_id}")
            )

    return parquet_topic_ingest(spark, src_dir, ckpt, sink)


def read_near_dups(spark: SparkSession, out_dir: str) -> DataFrame | None:
    from ..indexutil import read_batched

    return read_batched(spark, out_dir, "near_dups")


def read_copied_spans(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    from ..indexutil import read_batched

    return read_batched(spark, out_dir, "copied_spans")


# --- persisted gram index + copied-span scoring ---------------------------
# The position-level twin of the shingle index: score NEW documents for
# spans COPIED from the corpus (the exact-substring-dedup question at
# ingest time) without recomputing corpus grams. The index is just the
# DISTINCT corpus gram-hash set — a new-doc position is copied iff its
# gram exists in the set, so no corpus positions are persisted and the
# layout is one hash column. Appends are per-ROW idempotent (one row
# per distinct hash; a crashed job commit persists a subset of whole
# hashes — same argument as the vector indexes, no doc-granularity
# hazard like the shingle layout's).
GRAM_SUBDIRS = ("grams", "meta")


def _gram_index_k(index_dir: str, k: int | None) -> int:
    """Resolve the gram width for an index operation. The width is a
    BUILD-time property persisted in ``meta/`` — hashing probes or
    appends at a different k would silently match nothing (or poison
    the set with mixed-width hashes), so an explicitly passed k that
    disagrees with the persisted one raises instead of zeroing every
    score. A pre-meta index defaults to 8 (the only width ever
    shipped). Shared contract: indexutil.resolve_index_meta (driver-
    side, memoized — no Spark job per probe)."""
    from ..indexutil import resolve_index_meta

    return resolve_index_meta(index_dir, "k", 8, k, "gram index")


def _backfill_gram_meta(
    spark: SparkSession, index_dir: str, k: int = 8
) -> bool:
    """Migrate a pre-meta gram index in place (same contract as the
    shingle index's build_stats backfill: a layout upgrade must never
    let staged_index_build treat a GROWN index as debris and rebuild
    it from the caller's docs, dropping appended hashes). k=8 is the
    only width a pre-meta build could have used — so a caller
    demanding a DIFFERENT k raises inside the migration (stating the
    assumption and the delete-and-rebuild remedy) rather than stamping
    the assumed default first and mislabeling the layout (the LSH
    twin shares this contract — indexutil.migrate_premeta_default)."""
    from ..indexutil import migrate_premeta_default

    if not os.path.isdir(os.path.join(index_dir, "grams")):
        return False
    return migrate_premeta_default(
        spark, index_dir, "k", 8, k, "gram index"
    )


def gram_index_build(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    k: int = 8,
) -> str:
    """Distinct corpus k-gram hashes + a one-row ``meta/`` recording
    the gram width, staged + atomically renamed. An existing complete
    index is reused ONLY if its persisted k matches; a pre-meta index
    is migrated in place first."""
    from ..indexutil import staged_index_build
    from ..plans.textops import gram_positions

    spark = docs.sparkSession
    _backfill_gram_meta(spark, index_dir, k)
    if os.path.isdir(os.path.join(index_dir, "grams")):
        _gram_index_k(index_dir, k)  # mismatch raises

    def write(staging: str) -> None:
        gram_positions(
            docs.dropDuplicates(["doc_id"]), text_col, k
        ).select("h").distinct().write.parquet(
            os.path.join(staging, "grams")
        )
        from ..indexutil import write_meta_into

        write_meta_into(spark, os.path.join(staging, "meta"), {"k": k})

    return staged_index_build(index_dir, GRAM_SUBDIRS, write)


def gram_index_append(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    k: int | None = None,
) -> int:
    """Fold new docs' gram hashes into the index (hashes already
    present are skipped — idempotent at hash granularity). The gram
    width comes from the INDEX (``k`` may be passed only as a
    cross-check; a mismatch raises rather than poisoning the set with
    mixed-width hashes). Returns hashes appended. Stopped-writer
    window, like every parquet append here."""
    from ..plans.textops import gram_positions

    grams = os.path.join(index_dir, "grams")
    if not os.path.isdir(grams):
        raise ValueError(f"not a valid gram index: {index_dir!r}")
    k = _gram_index_k(index_dir, k)
    existing = _read_layout(spark, grams)
    fresh = (
        gram_positions(docs.dropDuplicates(["doc_id"]), text_col, k)
        .select("h")
        .distinct()
        .join(existing, "h", "left_anti")
        .localCheckpoint(eager=True)  # sever lineage before the append
    )
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(grams)
    return n


def score_new_docs_spans(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """(new_doc, n_pos, dup_pos, max_run) per new doc: how much of it
    is COPIED from the indexed corpus — dup positions are those whose
    k-gram exists in the index; consecutive copies form runs (span
    tokens = max_run + k - 1). The gram width comes from the INDEX
    (pass ``k`` only as a cross-check; mismatch raises). One shuffle on the 8-byte hash (the
    membership join), one on doc_id (the islands window); new-vs-new
    repetition inside a batch deliberately does NOT count (that is the
    batch-internal duplicated_span_stats' job)."""
    from ..plans.textops import gram_positions, span_rollup

    k = _gram_index_k(index_dir, k)
    g = gram_positions(new_docs.dropDuplicates(["doc_id"]), text_col, k)
    idx = _read_layout(spark, os.path.join(index_dir, "grams")).select(
        "h", F.lit(True).alias("hit")
    )
    occ = g.join(idx, "h", "left").select(
        "doc_id", "pos", F.col("hit").isNotNull().alias("is_dup")
    )
    return span_rollup(occ).withColumnRenamed("doc_id", "new_doc")
