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
        return all(os.path.isdir(os.path.join(d, s)) for s in subdirs)

    if os.path.isdir(index_dir):
        if _valid(index_dir):
            return index_dir
        shutil.rmtree(index_dir, ignore_errors=True)
    staging = f"{index_dir}.building-{uuid.uuid4().hex[:8]}"
    write(staging)
    try:
        os.rename(staging, index_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # concurrent build won
    if not _valid(index_dir):
        raise RuntimeError(
            f"index at {index_dir!r} is invalid after build"
        )
    return index_dir


def read_batched(spark, out_dir: str, sub: str):
    """Read a ``<out>/<sub>/batch=N`` side-output tree (None if the
    ingest never produced it), dropping the batch bookkeeping column."""
    path = os.path.join(out_dir, sub)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path).drop("batch")
