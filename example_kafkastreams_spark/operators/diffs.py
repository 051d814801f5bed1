"""Corpus snapshot diff — the dataset-version audit.

A 100 TB training corpus is rebuilt (re-crawled, re-filtered,
re-deduped) on a cadence; before a new snapshot replaces the old one,
the release process wants the delta: which documents appeared,
vanished, or changed content, and how much survived untouched. This is
the batch twin of the reference's changelog semantics (a KTable diff
between two materializations).

Scale shape: both sides reduce to (key, 32-hex-char digest) BEFORE the
full-outer join, so the shuffle carries digests, never document bytes —
the same never-shuffle-text discipline as operators.neardup. The
unchanged majority is never materialized row-by-row downstream: callers
aggregate it to a count while the (small) added/removed/changed sets
stay row-grain. With both snapshots bucketed on the key
(sources.bucketed), the join is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def content_digest(cols: list[str]) -> Column:
    """md5 over unit-separator-joined columns — the same digest
    expression both engines compute (DuckDB: md5(concat_ws(...)))."""
    if len(cols) == 1:
        return F.md5(F.col(cols[0]))
    return F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    content_cols: list[str],
) -> DataFrame:
    """Key-level diff of snapshot ``a`` (old) vs ``b`` (new).

    Returns one row per key present in either snapshot: ``key``,
    ``digest_a``, ``digest_b`` and ``status`` in
    {'added','removed','changed','unchanged'}. Keys must be unique per
    snapshot (it's a keyed table diff, not a multiset diff — run exact
    dedup first; operators.neardup handles multisets).
    """
    dg = content_digest(content_cols)
    fa = a.select(F.col(key), dg.alias("digest_a"))
    fb = b.select(F.col(key), dg.alias("digest_b"))
    status = (
        F.when(F.col("digest_a").isNull(), "added")
        .when(F.col("digest_b").isNull(), "removed")
        .when(F.col("digest_a") != F.col("digest_b"), "changed")
        .otherwise("unchanged")
    )
    return fa.join(fb, on=key, how="full").select(
        key, "digest_a", "digest_b", status.alias("status")
    )


def snapshot_diff_counts(diff: DataFrame) -> DataFrame:
    """Status census of a diff frame — the one-line release report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
