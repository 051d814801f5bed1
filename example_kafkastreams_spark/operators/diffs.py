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


def corpus_drift_report(
    old_docs: DataFrame,
    new_docs: DataFrame,
    group_col: str = "source",
    value: Column | None = None,
    lo: float = 0.0,
    hi: float = 512.0,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group DISTRIBUTION drift between two corpus snapshots —
    the statistical half of the release audit next to the key-level
    ``snapshot_diff``: a re-crawl can keep every key yet silently
    shift the length/quality profile of a source (truncation bugs,
    boilerplate growth); this reports how far each source's value
    distribution moved.

    Per group: ``n_old``/``n_new`` row counts, ``l1_num`` and ``tvd``
    — the total-variation distance ½·Σ|aᵢ/N_A − bᵢ/N_B| over the
    groups' equi-width histograms (``value`` defaults to whitespace
    token count, the length profile). Computed EXACTLY: the
    cross-multiplied numerator Σ|aᵢ·N_B − bᵢ·N_A| is an integer sum
    (order-independent), the division by 2·N_A·N_B is one IEEE op —
    bit-reproducible cross-engine, no per-bucket float accumulation.
    Long overflow needs N_A·N_B < 2⁶³ (fine through ~10⁹-row sources;
    beyond that cast the numerator to DECIMAL and accept the slow
    path).

    Scale: two grouped-histogram aggregates (exchange ≤
    groups·n_buckets each), a bucket-grain full-outer join and a
    group-grain fold — the corpora are scanned once each and never
    shuffled.
    """
    from ..functions import portable as P
    from .sketches import histogram_sketch_grouped

    if value is None:
        value = F.expr(
            P.size_(P.split_ws("text", P.SPARK), P.SPARK)
        ).cast("double")

    def hist(df: DataFrame) -> DataFrame:
        vals = df.select(F.col(group_col), value.alias("__v"))
        return histogram_sketch_grouped(
            vals, [group_col], "__v", lo, hi, n_buckets
        )

    ha = hist(old_docs).withColumnRenamed("cnt", "a")
    hb = hist(new_docs).withColumnRenamed("cnt", "b")
    joined = ha.join(hb, [group_col, "bucket"], "full_outer").select(
        group_col,
        F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("b"),
    )
    per_group = joined.groupBy(group_col).agg(
        F.sum("a").alias("n_old"), F.sum("b").alias("n_new")
    )
    num = (
        joined.join(per_group, group_col)
        .select(
            group_col,
            "n_old",
            "n_new",
            F.abs(
                F.col("a") * F.col("n_new") - F.col("b") * F.col("n_old")
            ).alias("__d"),
        )
        .groupBy(group_col, "n_old", "n_new")
        .agg(F.sum("__d").alias("l1_num"))
    )
    return num.select(
        group_col,
        "n_old",
        "n_new",
        "l1_num",
        F.when(
            (F.col("n_old") == 0) | (F.col("n_new") == 0), F.lit(None)
        )
        .otherwise(
            F.col("l1_num").cast("double")
            / (F.lit(2) * F.col("n_old") * F.col("n_new")).cast("double")
        )
        .alias("tvd"),
    )
