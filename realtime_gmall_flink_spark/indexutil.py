"""Shared scaffolding for persisted index artifacts (IVF, LSH, shingle).

One pattern, one implementation: build into a staging sibling, rename
atomically into place (losers of a concurrent-build race discard their
staging), validate, and never trust debris at the target path.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence


def _valid_index(d: str, subdirs: Sequence[str]) -> bool:
    return all(os.path.isdir(os.path.join(d, s)) for s in subdirs)


def staged_index_build(
    index_dir: str,
    subdirs: Sequence[str],
    write: Callable[[str], None],
) -> str:
    """Build an index at ``index_dir`` whose layout is ``subdirs``.
    ``write(staging_dir)`` materializes every subdir into the staging
    path; the rename into place is atomic, so a crashed or concurrent
    build can never leave a half-index at ``index_dir``. An existing
    complete index is reused; an existing dir missing any subdir is
    untrusted debris and rebuilt."""

    def _valid(d: str) -> bool:
        return _valid_index(d, subdirs)

    recover_index(index_dir, subdirs)  # heal a crashed rebuild swap
    if os.path.isdir(index_dir):
        if _valid(index_dir):
            return index_dir
        shutil.rmtree(index_dir, ignore_errors=True)
    staging = f"{index_dir}.building-{uuid.uuid4().hex[:8]}"
    try:
        write(staging)
    except BaseException:
        # a refused/crashed write must not leave orphan staging debris
        # (recover_index only sweeps rebuild/tombstone siblings)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    try:
        os.rename(staging, index_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # concurrent build won
    if not _valid(index_dir):
        raise RuntimeError(
            f"index at {index_dir!r} is invalid after build"
        )
    return index_dir


def read_batched(spark, out_dir: str, sub: str, merge_schema: bool = False):
    """Read a ``<out>/<sub>/batch=N`` side-output tree (None if the
    ingest never produced it), dropping the batch bookkeeping column.
    ``merge_schema`` is for trees whose LAYOUT evolved across batches
    (a column added by a newer ingest version): schema inference
    samples one file and would silently drop the new column whenever a
    pre-upgrade batch is sampled first — readers that branch on such a
    column's presence must see the union schema."""
    path = os.path.join(out_dir, sub)
    if not os.path.isdir(path):
        return None
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path).drop("batch")


_REBUILD_PREFIX = ".rebuild-"
_TOMB_PREFIX = ".old-"


def _run_id() -> str:
    """Suffix for rebuild/tombstone siblings: a zero-padded nanosecond
    timestamp first so lexicographic order IS chronological order, plus
    a uuid fragment so concurrent runs in the same nanosecond cannot
    collide."""
    import time

    return f"{time.time_ns():020d}-{uuid.uuid4().hex[:6]}"


def _siblings(index_dir: str, prefix: str) -> list[str]:
    """Sibling rebuild/tombstone dirs, oldest first. Ordered by mtime
    with the name as tiebreak: new suffixes sort chronologically by
    name too, but legacy uuid-suffixed dirs do not, and recovery must
    promote the NEWEST candidate."""
    parent, base = os.path.split(os.path.abspath(index_dir))
    if not os.path.isdir(parent):
        return []

    def _key(p: str) -> tuple[float, str]:
        try:
            return (os.path.getmtime(p), p)
        except OSError:
            return (0.0, p)

    return sorted(
        (
            os.path.join(parent, d)
            for d in os.listdir(parent)
            if d.startswith(f"{base}{prefix}")
        ),
        key=_key,
    )


def recover_index(index_dir: str, subdirs: Sequence[str]) -> bool:
    """Heal a crashed rebuild swap. The swap protocol is: build a
    complete new index at ``<index>.rebuild-<run>``, rename the live
    index to ``<index>.old-<run>`` (tombstone), rename the rebuild into
    place, drop the tombstone. The only window where the live path is
    missing is between the two renames — recovery ROLLS FORWARD to the
    newest complete rebuild if one exists, else ROLLS BACK to the
    newest complete tombstone (newest by mtime; run suffixes are also
    timestamp-ordered so surviving candidates resolve deterministically
    even if mtimes tie); leftover rebuild/tombstone dirs are swept once
    the live index is valid. Returns True if a roll was performed."""

    def _valid(d: str) -> bool:
        return _valid_index(d, subdirs)

    rolled = False
    if not os.path.isdir(index_dir):
        candidates = [
            d for d in _siblings(index_dir, _REBUILD_PREFIX) if _valid(d)
        ] or [d for d in _siblings(index_dir, _TOMB_PREFIX) if _valid(d)]
        if candidates:
            os.rename(candidates[-1], index_dir)
            rolled = True
    # a crashed COMPACTION swap can leave a subdir (or its only
    # partition unit) tombed — heal it here too, BEFORE validity is
    # judged: staged_index_build rmtree's an invalid index, which
    # would otherwise delete the tomb holding the only copy of the
    # appended rows
    if os.path.isdir(index_dir):
        rolled = recover_compaction(index_dir) or rolled
        for s in subdirs:
            sub = os.path.join(index_dir, s)
            if os.path.isdir(sub):
                rolled = recover_compaction(sub) or rolled
    if os.path.isdir(index_dir) and _valid(index_dir):
        for prefix in (_REBUILD_PREFIX, _TOMB_PREFIX):
            for d in _siblings(index_dir, prefix):
                shutil.rmtree(d, ignore_errors=True)
    return rolled


def rebuild_index(
    index_dir: str,
    subdirs: Sequence[str],
    write: Callable[[str], None],
) -> str:
    """Rebuild an index IN PLACE with an atomic swap: the new index is
    built complete at a sibling path, then two renames exchange it for
    the live one (old index tombstoned, removed last). The swap needs a
    STOPPED-WORLD window for this index — no writers AND no in-flight
    readers: a reader spanning the two renames could pair one subdir
    from the old index with another from the new (e.g. old centroids
    against the new assignment), or list files the tombstone cleanup
    then deletes. Any crash is healed by :func:`recover_index` (also
    run implicitly here and by ``staged_index_build``)."""

    def _valid(d: str) -> bool:
        return _valid_index(d, subdirs)

    recover_index(index_dir, subdirs)
    run = _run_id()
    new_dir = f"{index_dir}{_REBUILD_PREFIX}{run}"
    try:
        write(new_dir)
    except BaseException:
        shutil.rmtree(new_dir, ignore_errors=True)  # no orphan debris
        raise
    if not _valid(new_dir):
        shutil.rmtree(new_dir, ignore_errors=True)
        raise RuntimeError(
            f"rebuild for {index_dir!r} produced an invalid index"
        )
    if os.path.isdir(index_dir):
        os.rename(index_dir, f"{index_dir}{_TOMB_PREFIX}{run}")
    os.rename(new_dir, index_dir)
    shutil.rmtree(f"{index_dir}{_TOMB_PREFIX}{run}", ignore_errors=True)
    return index_dir


# --- one-row meta/ (persisted build-time parameters) ----------------------
# Shared by every index that freezes a build parameter in its layout
# (gram width k, LSH bucket width bits): ONE implementation of the
# write / read / validate / backfill contract so crash-safety and
# error shapes cannot drift between indexes.

_meta_cache: dict[str, tuple[tuple, dict]] = {}


def _meta_parts(meta: str) -> list[str]:
    return sorted(
        os.path.join(meta, f)
        for f in os.listdir(meta)
        if f.endswith(".parquet")
    )


def write_meta_into(spark, target_dir: str, row: dict) -> None:
    """Write the one-row meta parquet for ``row`` into ``target_dir``
    — the ONE definition of the meta file shape (bigint fields —
    counts like PQ's n_vecs are unbounded and would overflow int32 at
    cluster scale; readers get Python ints either way — single-part
    coalesce), used by build-time staged writes and the atomic
    backfill alike so the contract cannot drift per index."""
    fields = ", ".join(f"{k} bigint" for k in row)
    spark.createDataFrame(
        [tuple(row.values())], fields
    ).coalesce(1).write.parquet(target_dir)


_META_TOMB = ".meta-tomb-"
_META_NEW = ".meta-new-"


# --- the ONE tomb protocol -------------------------------------------------
# Three maintenance surfaces commit a staged unit the same way (park the
# live unit in a tomb, rename the staged unit in, sweep the tomb) and
# heal a crash the same way (the tomb holds the ORIGINAL unit — the safe
# state — restored iff the live unit is missing/invalid). They differ
# ONLY in tomb placement: parent-level siblings (meta swaps), a grouped
# per-run tomb root (compaction), reader-invisible in-layout dot-dirs
# (fingerprint buckets). These two functions are that protocol; the
# three surfaces pass paths.


def commit_unit_swap(live: str, staged: str | None, tomb: str) -> None:
    """Commit one staged unit: park ``live`` at ``tomb`` (if present),
    rename ``staged`` into place (if given and present — a bucket that
    emptied has no staged dir), sweep the tomb. A crash at any point
    leaves the unit wholly old (tomb) or wholly new (live), never
    absent AND untombed — :func:`resolve_tombed_unit` heals both."""
    had_live = os.path.isdir(live)
    if had_live:
        os.rename(live, tomb)
    if staged is not None and os.path.isdir(staged):
        os.rename(staged, live)
    if had_live:
        shutil.rmtree(tomb, ignore_errors=True)


def resolve_tombed_unit(tomb: str, live: str, live_ok=None) -> bool:
    """Heal one tombed unit: the tomb holds the ORIGINAL (safe) state.
    Restore it when the live unit is missing or fails ``live_ok``
    (sweeping a wedged live first), sweep it when a good live exists
    (the crash hit after the new unit landed). True iff restored."""
    ok = live_ok(live) if live_ok is not None else os.path.isdir(live)
    if ok:
        shutil.rmtree(tomb, ignore_errors=True)
        return False
    if os.path.isdir(live):
        shutil.rmtree(live, ignore_errors=True)
    os.rename(tomb, live)
    return True


def recover_meta(index_dir: str) -> bool:
    """Heal a crashed :func:`update_index_meta` swap (the tomb protocol
    with parent-level placement): only the NEWEST tomb can be the
    interrupted swap's original — older ones are completed-swap debris,
    swept before resolution so they can never be restored over it.
    ``.meta-new-`` staging is never the safe state and always swept."""
    tombs = _siblings(index_dir, _META_TOMB)
    for d in _siblings(index_dir, _META_NEW):
        shutil.rmtree(d, ignore_errors=True)
    if not tombs:
        return False
    for t in tombs[:-1]:
        shutil.rmtree(t, ignore_errors=True)
    return resolve_tombed_unit(
        tombs[-1],
        os.path.join(index_dir, "meta"),
        live_ok=lambda d: os.path.isdir(d) and bool(_meta_parts(d)),
    )


def update_index_meta(spark, index_dir: str, updates: dict) -> dict:
    """Merge ``updates`` into the index's one-row meta ATOMICALLY:
    staged write of the merged row, then a two-rename swap that parks
    the original meta in a ``.meta-tomb-`` sibling until the new row
    is in place — a crash at any point leaves either the original or
    the complete new meta recoverable (:func:`recover_meta`, which
    both this function and the meta read path invoke). Stopped-world
    like every other index maintenance op. Returns the merged row.
    Used by post-build parameter refreshes (e.g. probe-width
    recalibration) that must not invalidate the layout they update."""
    recover_meta(index_dir)
    row = read_index_meta(index_dir)
    if row is None:
        raise ValueError(
            f"update_index_meta: {index_dir!r} has no meta/ to update"
            " — backfill one first (write_index_meta_atomic) or rerun"
            " the build"
        )
    merged = {**row, **updates}
    staging = f"{index_dir}{_META_NEW}{uuid.uuid4().hex[:8]}"
    write_meta_into(spark, staging, merged)
    commit_unit_swap(
        os.path.join(index_dir, "meta"),
        staging,
        f"{index_dir}{_META_TOMB}{uuid.uuid4().hex[:8]}",
    )
    return merged


def write_index_meta_atomic(spark, index_dir: str, row: dict) -> bool:
    """Backfill ``<index>/meta`` with one row of build parameters,
    ATOMICALLY: the parquet job writes a staging sibling which is then
    renamed into place, so no crash can leave a half-written meta
    inside a layout that _valid_index would bless (the staged/atomic-
    rename invariant every other subdir follows). Returns True only
    when THIS caller's row landed; a lost rename race (a concurrent
    winner's meta appeared) discards the staging and returns False. A
    wedged meta dir with no parquet part (a legacy non-atomic crash)
    is healed: treated as debris and rewritten. Stale ``.meta-*``
    staging debris is swept only AFTER winning the rename — a sweep
    before winning could destroy a concurrent writer's in-flight
    staging (index maintenance runs in stopped-writer windows, so a
    surviving concurrent writer is an operator error this narrows, not
    a supported mode)."""
    meta = os.path.join(index_dir, "meta")
    if not os.path.isdir(index_dir):
        return False
    # a crashed update_index_meta swap may have parked the REAL meta in
    # a tomb — restoring it must win over backfilling a fresh row that
    # would silently drop the tombed row's refreshed parameters
    recover_meta(index_dir)
    if os.path.isdir(meta) and not _meta_parts(meta):
        shutil.rmtree(meta, ignore_errors=True)  # heal a wedged meta
    if os.path.isdir(meta):
        return False
    staging = f"{index_dir}.meta-{uuid.uuid4().hex[:8]}"
    write_meta_into(spark, staging, row)
    try:
        os.rename(staging, meta)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # concurrent winner
        return False
    for d in _siblings(index_dir, ".meta-"):
        shutil.rmtree(d, ignore_errors=True)  # we won: sweep debris
    return True


def read_layout(spark, path: str):
    """``spark.read.parquet(path)`` with the schema resolved
    DRIVER-SIDE (one pyarrow footer read + a directory walk) instead
    of Spark's schema-inference job. Probe hot paths re-open each
    metadata-sized layout dir per call, and the inference pass costs a
    whole Spark job plus its scheduling gap per open — at 100 TB it
    additionally samples footers across the layout. Partition
    directory columns (``name=value`` — ``cid``/``bkt_hi``/``shard``,
    integral in every persisted layout) are appended as IntegerType,
    matching what Spark's own partition inference derives for them.
    Any layout shape this walk does not recognize falls back to the
    inference read unchanged."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    part_cols: list[str] = []
    d, part_file = path, None
    while part_file is None:
        if not os.path.isdir(d):
            part_file = d
            break
        pcol, nxt = None, None
        try:
            entries = sorted(os.scandir(d), key=lambda e: e.name)
        except OSError:
            return spark.read.parquet(path)
        for e in entries:
            n = e.name
            if n.startswith(("_", ".")):
                continue
            if e.is_file() and n.endswith(".parquet"):
                part_file = e.path
                break
            if e.is_dir() and "=" in n:
                pcol, nxt = n.split("=", 1)[0], e.path
        if part_file is not None:
            break
        if nxt is None:  # empty or unrecognized layout
            return spark.read.parquet(path)
        part_cols.append(pcol)
        d = nxt
    try:
        sch = footer_spark_schema(part_file)
    except Exception:
        return spark.read.parquet(path)
    fields = list(sch.fields) + [
        StructField(c, IntegerType(), True) for c in part_cols
    ]
    return spark.read.schema(StructType(fields)).parquet(path)


def local_frame(spark, data, schema):
    """``createDataFrame`` for DRIVER-LOCAL bounded row sets. Fast
    path: rows of numeric/string/binary/boolean scalars (and arrays/
    structs of those) build a pyarrow Table first, which Catalyst
    plans as a genuine ``LocalRelation`` — LocalTableScan execution
    with no Python-worker task and driver-side broadcast builds
    (measured ~3x per bounded action vs the pickled-RDD form; doubles
    cross the Arrow boundary bit-exactly). Anything the gate or the
    conversion rejects (timestamps/decimals keep pickle semantics)
    falls back to a ONE-slice ``parallelize``: the default path would
    split tiny row sets across defaultParallelism near-empty slices,
    scheduling one task per core for rows that fit in one — measured
    4x on a one-row frame's bounded fetch (OPTIMIZATION_r13.md). Same
    values either way; only the physical plan differs."""
    sch = schema
    if isinstance(sch, str):
        sch = _parsed_ddl(sch) or schema
    if not isinstance(sch, str) and _arrow_safe_type(sch):
        try:
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema

            asch = to_arrow_schema(sch)
            names = asch.names
            # arity guard: pa.Table.from_pylist would silently TRUNCATE
            # an over-long row and NULL-fill a short one where the
            # pickled-RDD path raises a job failure — malformed internal
            # callers must fail loudly on the strict legacy path, not
            # fabricate NULLs
            data = data if isinstance(data, (list, tuple)) else list(data)
            if any(len(r) != len(names) for r in data):
                raise ValueError("row arity != schema arity")
            tbl = pa.Table.from_pylist(
                [dict(zip(names, r)) for r in data], schema=asch
            )
            return spark.createDataFrame(tbl, schema=sch)
        except Exception:
            pass
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )


def _parsed_ddl(schema: str):
    """DDL string -> StructType via the JVM parser, memoized: the
    engine's bounded local frames reuse a handful of schema strings,
    and the parse is a py4j round-trip per call otherwise. DataType
    objects are plain Python — safe to share across sessions. Returns
    None when parsing fails (caller keeps the raw string for the
    createDataFrame fallback, whose own error surfaces unchanged)."""
    hit = _DDL_CACHE.get(schema)
    if hit is not None:
        return hit
    try:
        from pyspark.sql.types import _parse_datatype_string

        parsed = _parse_datatype_string(schema)
    except Exception:
        return None
    _DDL_CACHE[schema] = parsed
    return parsed


_DDL_CACHE: dict = {}


def _arrow_safe_type(dt) -> bool:
    """True when every leaf of ``dt`` is a type whose Python->Arrow->
    Spark round-trip is value-identical to the pickled-RDD path:
    integers, floats (bit-exact incl. non-finite), strings, binary,
    booleans, and arrays/structs over those. Temporal and decimal
    types are deliberately OUT (their conversion semantics live in the
    pickler; callers that need them keep the legacy path)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructType,
    )

    scalar = (
        ByteType,
        ShortType,
        IntegerType,
        LongType,
        FloatType,
        DoubleType,
        StringType,
        BinaryType,
        BooleanType,
    )
    if isinstance(dt, StructType):
        return all(_arrow_safe_type(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _arrow_safe_type(dt.elementType)
    return isinstance(dt, scalar)


def footer_spark_schema(part_file: str):
    """One parquet footer → the Spark schema ``spark.read.parquet``
    would infer for it, derived driver-side: tz-less arrow timestamps
    map to TIMESTAMP_NTZ (Spark's inferTimestampNTZ default), and
    nano-precision tz-less timestamps map to LongType (mirroring the
    ``nanosAsLong`` conf every engine session sets). Everything else
    is the standard arrow→Spark mapping."""
    import pyarrow as pa
    import pyarrow.parquet as _pq
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    a = _pq.read_schema(part_file)
    sch = from_arrow_schema(a)
    fields = []
    for f, af in zip(sch.fields, a):
        t = f.dataType
        if pa.types.is_timestamp(af.type) and af.type.tz is None:
            t = LongType() if af.type.unit == "ns" else TimestampNTZType()
        fields.append(StructField(f.name, t, f.nullable))
    return StructType(fields)


def read_index_meta(index_dir: str) -> dict | None:
    """The meta row as a dict (None if the index has no meta/ yet).
    Read DRIVER-SIDE via pyarrow — no Spark job on the probe hot path
    — and memoized per (path, identity) so a probe-many loop pays the
    footer read once. A meta dir with NO parquet part is a wedged
    legacy write and raises (defaulting silently would probe a
    non-default-width index at the wrong width); the atomic backfill
    heals that state."""
    meta = os.path.join(index_dir, "meta")
    if not os.path.isdir(meta):
        # missing may mean a crashed update_index_meta swap parked the
        # real meta in a tomb — cheap check (one parent listdir) taken
        # only on this cold path, never when meta exists
        if not recover_meta(index_dir):
            return None
    parts = _meta_parts(meta)
    if not parts:
        if recover_meta(index_dir):  # wedged mid-swap loser + a tomb
            parts = _meta_parts(meta)
    if not parts:
        raise ValueError(
            f"wedged meta at {meta!r} (no parquet part) — rerun the"
            " index build to heal it"
        )
    key = os.path.realpath(meta)
    st, pst = os.stat(meta), os.stat(parts[0])
    # inode + both mtimes: a same-tick rmtree+rewrite (coarse-mtime
    # filesystems) still changes the inode or the part identity
    token = (st.st_ino, st.st_mtime_ns, parts[0], pst.st_mtime_ns)
    hit = _meta_cache.get(key)
    if hit and hit[0] == token:
        return hit[1]
    import pyarrow.parquet as pq

    row = pq.read_table(parts[0]).to_pylist()[0]
    _meta_cache[key] = (token, row)
    return row


def resolve_index_meta(
    index_dir: str,
    field: str,
    default: int,
    passed: int | None,
    what: str,
) -> int:
    """Resolve a build-time parameter for an index operation: the
    persisted value wins; a pre-meta index falls back to ``default``;
    an explicitly ``passed`` value that disagrees raises instead of
    silently probing/hashing at the wrong width. The two mismatch
    errors are worded differently on purpose: a recorded value is a
    FACT ("was built with"), the pre-meta fallback is an ASSUMPTION —
    stating the default as recorded would mislead an operator whose
    legacy index really was built at the passed width (the
    migrate_premeta_default contract, applied to probe/append)."""
    row = read_index_meta(index_dir)
    stored = row[field] if row is not None else default
    if passed is not None and passed != stored:
        if row is None:
            raise _assumed_width_error(
                index_dir, field, default, passed, what
            )
        raise ValueError(
            f"{what} at {index_dir!r} was built with {field}={stored}; "
            f"got {field}={passed} — rebuild the index to change it"
        )
    return stored


def _assumed_width_error(
    index_dir: str,
    field: str,
    default: int,
    passed: int,
    what: str,
    state: str = "predates meta/",
) -> ValueError:
    """The ONE wording for every unrecorded-build-parameter mismatch
    (pre-meta probe/append, pre-meta migration, wedged-meta migration):
    states the assumption — never "was built with" for a value nobody
    recorded — and the delete-and-rebuild remedy. ``state`` names what
    is actually on disk so a wedged meta is not misdescribed as
    absent."""
    return ValueError(
        f"{what} at {index_dir!r} {state}: its {field} is unrecorded"
        f" and assumed {default} (the only value this repo's tooling"
        f" ever built); got {field}={passed} — if the index really was"
        f" built at {field}={passed}, delete the index dir and rebuild"
        f" it"
    )


def migrate_premeta_default(
    spark,
    index_dir: str,
    field: str,
    default: int,
    passed: int | None,
    what: str,
) -> bool:
    """Migrate a pre-meta layout in place by stamping the DEFAULT
    build parameter — the only value this repo's tooling ever built,
    and the only one provenance supports (the true width is unknowable
    from the layout's bytes). A caller simultaneously demanding a
    NON-default value must NOT trigger the stamp: baking the assumed
    default in first would turn the subsequent mismatch error into a
    lie ("was built with X" for a value nobody recorded) and leave a
    legacy index genuinely built at another width permanently
    mislabeled. Instead that call raises HERE, stating the assumption
    and the manual remedy. A wedged meta (legacy non-atomic crash) is
    healed by the atomic stamp like any other pre-meta state."""
    if passed is not None and passed != default:
        state = "predates meta/"
        try:
            row = read_index_meta(index_dir)
        except ValueError:  # wedged meta: width as unknowable as pre-meta
            row = None
            state = "has a wedged meta/ (a crashed legacy write)"
        if row is None:
            raise _assumed_width_error(
                index_dir, field, default, passed, what, state
            )
        return False  # a real meta exists; resolve_index_meta adjudicates
    return write_index_meta_atomic(spark, index_dir, {field: default})


# --- small-file compaction for append-heavy layouts -----------------------
# Every idempotent append (ivf_append, lsh_append, pq/sq8/ivfpq appends)
# writes one parquet file set per batch: a streaming ingest of thousands
# of micro-batches leaves thousands of tiny files per partition dir, and
# at 100 TB the pruned probe's cost flips from bytes-read to
# file-listing + footer-open overhead. Compaction rewrites each
# oversized UNIT (a 'col=val' partition dir, or a whole flat subdir like
# the PQ codes) to ~target_bytes files with an ATOMIC per-unit swap:
#   stage:  write compacted parts to <root>/.compact-stage-<run>/<unit>
#   verify: pyarrow footer row counts stage == live (no Spark job)
#   swap:   rename(live -> <root>/.compact-tomb-<run>/<unit>),
#           rename(stage -> live), remove the tombed unit
# Dot-prefixed dirs are invisible to Spark's file listing, so neither
# staging nor tombs ever appear in a concurrent read — but the swap
# itself needs the layout's usual STOPPED-WRITER maintenance window
# (a reader spanning the two renames could list a unit twice or not at
# all). Any crash is healed by recover_compaction: ROLL BACK to the
# tombed original (compaction is pure optimization — the uncompacted
# files are always the safe state), sweep stage/tomb debris.

_COMPACT_STAGE_PREFIX = ".compact-stage-"
_COMPACT_TOMB_PREFIX = ".compact-tomb-"


def _unit_parts(d: str) -> list[str]:
    try:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    except OSError:
        return []


def _footer_rows(files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def recover_compaction(root: str) -> bool:
    """Heal a crashed compaction swap under ``root`` (the tomb
    protocol with a grouped per-run tomb root): each tombed unit
    resolves via :func:`resolve_tombed_unit`; stage roots are always
    debris (pre-swap work, safely rebuilt next run). Returns True if
    any unit was rolled back."""
    if not os.path.isdir(root):
        return False
    rolled = False
    for e in sorted(os.listdir(root)):
        p = os.path.join(root, e)
        if e.startswith(_COMPACT_TOMB_PREFIX) and os.path.isdir(p):
            for unit in sorted(os.listdir(p)):
                rolled = (
                    resolve_tombed_unit(
                        os.path.join(p, unit), os.path.join(root, unit)
                    )
                    or rolled
                )
            shutil.rmtree(p, ignore_errors=True)
        elif e.startswith(_COMPACT_STAGE_PREFIX):
            shutil.rmtree(p, ignore_errors=True)
    return rolled


def compact_layout(
    spark,
    layout_dir: str,
    max_files: int = 8,
    target_bytes: int = 64 << 20,
) -> dict:
    """Compact every oversized unit of ``layout_dir`` (see module
    comment): partition dirs when the layout is partitioned, else the
    layout dir itself as one flat unit (staged/tombed under its
    PARENT, so the swap stays a single dir rename). Only units holding
    more than ``max_files`` parquet parts rewrite; each rewrites to
    ceil(bytes / target_bytes) files. Returns a report dict; healing
    runs first (at both candidate roots, before any unit listing), so
    calling this after a crash is always safe — and recover_index runs
    the same healing, so build/rebuild/probe recovery paths heal a
    crashed compaction too.

    Like every index maintenance op here, this expects a STOPPED-WORLD
    window for the layout: concurrent compaction runs on the same
    layout are NOT supported (each run's recovery would sweep the
    other's in-flight staging), same operator contract as
    rebuild_index. This is deliberately separate machinery from
    streaming/compaction.py: sink compaction must flip the
    _spark_metadata transaction log a streaming reader resolves files
    through, while index layouts have no log — readers list the
    filesystem, so the unit of atomicity here is the dir rename."""
    report = {
        "units_total": 0,
        "units_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "rolled_back": False,
    }
    # heal FIRST, BEFORE any early return or unit listing: a mid-swap
    # crash can leave layout_dir itself missing (flat layout — its
    # tomb lives in the PARENT) or its only unit missing (partitioned
    # layout), and an early return on either state would strand the
    # tomb as the only copy of the data. Recovering first also means
    # rolled-back units are listed and compacted by THIS run, not
    # silently skipped. The PARENT heal is scoped to the flat-layout
    # shapes that need it (dir missing, or dir holding no partition
    # subunits): a partitioned layout never stages in the parent, and
    # an unconditional parent sweep would destroy a SIBLING flat
    # layout's in-flight staging under a shared index root. Two flat
    # layouts under ONE parent still share a healing root — don't
    # compact those concurrently (the stopped-world contract below).
    rolled = recover_compaction(layout_dir)
    flat_shaped = not os.path.isdir(layout_dir) or not any(
        "=" in e
        and not e.startswith((".", "_"))
        and os.path.isdir(os.path.join(layout_dir, e))
        for e in os.listdir(layout_dir)
    )
    if flat_shaped:
        rolled = (
            recover_compaction(
                os.path.dirname(os.path.abspath(layout_dir))
            )
            or rolled
        )
    report["rolled_back"] = rolled
    if not os.path.isdir(layout_dir):
        return report
    parts_here = _unit_parts(layout_dir)
    subunits = sorted(
        e
        for e in os.listdir(layout_dir)
        if "=" in e
        and not e.startswith((".", "_"))
        and os.path.isdir(os.path.join(layout_dir, e))
    )
    if subunits:
        root, units = layout_dir, subunits
    elif parts_here:
        root, units = (
            os.path.dirname(os.path.abspath(layout_dir)),
            [os.path.basename(os.path.abspath(layout_dir))],
        )
    else:
        return report
    run = _run_id()
    stage_root = os.path.join(root, f"{_COMPACT_STAGE_PREFIX}{run}")
    tomb_root = os.path.join(root, f"{_COMPACT_TOMB_PREFIX}{run}")
    try:
        for unit in units:
            live = os.path.join(root, unit)
            files = _unit_parts(live)
            report["units_total"] += 1
            report["files_before"] += len(files)
            if len(files) <= max_files:
                report["files_after"] += len(files)
                continue
            total = sum(os.path.getsize(f) for f in files)
            n_out = max(1, -(-total // target_bytes))
            stage_unit = os.path.join(stage_root, unit)
            spark.read.parquet(live).coalesce(n_out).write.parquet(
                stage_unit
            )
            staged_rows = _footer_rows(_unit_parts(stage_unit))
            live_rows = _footer_rows(files)
            if staged_rows != live_rows:
                # refuse the swap: a row-count disagreement means a
                # writer snuck into the maintenance window — the
                # uncompacted unit stays live, staging is debris
                raise RuntimeError(
                    f"compact_layout: staged unit {unit!r} holds"
                    f" {staged_rows} rows but the live unit"
                    f" holds {live_rows} — a writer appended"
                    " during the stopped-writer window; rerun"
                    " compaction inside a real maintenance window"
                )
            os.makedirs(tomb_root, exist_ok=True)
            commit_unit_swap(
                live, stage_unit, os.path.join(tomb_root, unit)
            )
            report["units_compacted"] += 1
            report["files_after"] += len(_unit_parts(live))
    finally:
        # success: stage is empty debris and every swapped unit's tomb
        # was removed inline, so this is a sweep. An in-process
        # exception (including one raised BETWEEN the two renames):
        # recover rolls any live-missing unit back from its tomb and
        # sweeps the rest — same healing a hard crash gets on the next
        # call, applied immediately
        recover_compaction(root)
    return report


# Tolerated parquet files per layout unit before drift reports raise
# compaction_recommended; refresh entry points pass the SAME value as
# the compact threshold so the remedy clears the cue that fired it.
FRAG_WARN = 64


def layout_fragmentation(layout_dir: str) -> dict:
    """File-count fragmentation of a layout, metadata-only (listdir —
    no parquet opened): per-unit parquet file counts plus the max, the
    drift-report cue for compact_layout. A flat layout reports itself
    as one unit named '.'."""
    if not os.path.isdir(layout_dir):
        return {"units": 0, "files": 0, "max_unit_files": 0}
    counts = {}
    subunits = [
        e
        for e in os.listdir(layout_dir)
        if "=" in e
        and not e.startswith((".", "_"))
        and os.path.isdir(os.path.join(layout_dir, e))
    ]
    if subunits:
        for u in subunits:
            counts[u] = len(_unit_parts(os.path.join(layout_dir, u)))
    else:
        counts["."] = len(_unit_parts(layout_dir))
    return {
        "units": len(counts),
        "files": sum(counts.values()),
        "max_unit_files": max(counts.values(), default=0),
    }
