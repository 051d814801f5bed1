"""Lifetime tracking for operator-internal persisted stages.

Sketch/bucket operators (neardup, knn) persist an intermediate stage
(signatures, bucket tables) because it fans out into several joins of
the same query. The operator returns a LAZY DataFrame, so it cannot
unpersist before the caller's terminal action — and a long-lived
session that invokes these operators repeatedly (the bench's
in-context replication loop, a notebook) would otherwise accumulate
one cached stage per invocation for the session's lifetime
(ADVICE r2).

``persist_tracked`` is the one choke point: it persists AND registers
the DataFrame; ``release_sketch_caches`` unpersists everything
registered. Callers that own their stage (e.g. passing a pre-persisted
``sig_df`` into minhash_lsh_pairs) are unaffected — only
operator-created stages are tracked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_SKETCH_CACHES: list[DataFrame] = []


def persist_tracked(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    df = df.persist(level)
    _SKETCH_CACHES.append(df)
    return df


def persist_pinned(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist WITHOUT registering for ``release_sketch_caches`` —
    for frames whose lifetime is a per-(session, corpus) MEMO (the
    q55/q58 build caches): the memo hands the same DataFrame to every
    later invocation, so a tracked release between bench branch
    timings would silently de-materialize a frame that is about to be
    re-consumed and every subsequent branch re-pays the build it was
    supposed to share. Use ONLY under a session memo — an untracked
    persist outside one is exactly the leak persist_tracked exists to
    prevent."""
    return df.persist(level)


def release_sketch_caches() -> int:
    """Unpersist every operator-created cached stage; returns count."""
    n = len(_SKETCH_CACHES)
    while _SKETCH_CACHES:
        df = _SKETCH_CACHES.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    return n
