"""Scoped tracking for operator-internal ``persist()`` calls.

Several operators persist intermediates that feed multiple consumers
(MinHash signatures feed both LSH self-join sides AND the verification
joins; the n-gram inverted index feeds both self-join sides). The
persist is load-bearing — without the materialization barrier Spark
recomputes the shingling per consumer — but a bare ``persist()`` from
inside an operator leaks: the caller gets a lazy DataFrame and has no
handle to release the cache after its terminal action.

This module gives every internal persist an owner:

- Operators route persists through :func:`persist_tracked`.
- A long-lived caller (bench harness, API server, foreachBatch sink)
  wraps each unit of work in :func:`cache_scope`; when the ``with``
  block exits — i.e. after the caller's action has run — every frame
  persisted inside it is unpersisted.
- Callers that never open a scope (the driver's one-shot correctness
  runner) keep today's behavior: frames stay cached for the process
  lifetime, visible via :func:`tracked_frames` and releasable in bulk
  with :func:`release_all`.

Scopes nest (innermost owns); tracking is per-process driver-side state,
which is exactly where persist/unpersist live in Spark.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_scopes: list[list[DataFrame]] = []
_unscoped: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)``, registered with the innermost active
    :func:`cache_scope` (or the process-global list if none is open)."""
    df = df.persist(level)
    (_scopes[-1] if _scopes else _unscoped).append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Unpersist every frame persisted (via :func:`persist_tracked`)
    inside the block when it exits. Run the terminal action INSIDE the
    block — unpersisting an already-consumed cache is the point;
    unpersisting before the action just forfeits the barrier (still
    correct, recomputes instead)."""
    frames: list[DataFrame] = []
    _scopes.append(frames)
    try:
        yield frames
    finally:
        _scopes.pop()
        for f in frames:
            f.unpersist(blocking=False)


def tracked_frames() -> list[DataFrame]:
    """Frames persisted outside any scope and not yet released."""
    return list(_unscoped)


def release_all() -> None:
    """Unpersist every unscoped tracked frame (bulk release for
    long-lived sessions that opted out of scoping)."""
    while _unscoped:
        _unscoped.pop().unpersist(blocking=False)
