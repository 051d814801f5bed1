"""Exact SUBSTRING dedup: remove repeated k-token spans from the
corpus (Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022 — the ExactSubstr variant).

Document- and chunk-grain dedup (neardup.py, text_chunks.py) drop or
keep WHOLE units; the regime they cannot reach is a long quote,
license header, or template embedded INSIDE otherwise-distinct
documents. ExactSubstr removes every maximal span all of whose
k-token windows occur more than once in the corpus — every occurrence
goes (the paper's convention: duplicated text is memorization fuel
regardless of which copy it is), leaving the surrounding novel text
intact.

Spark-first shape (suffix arrays do not distribute; the standard
approximation is window fingerprints):
1. WINDOWS — per doc, every k-token window at stride 1, hashed with
   md5 over the space-joined tokens: one ``transform``+``explode``
   over the token array, zero shuffle, the corpus's text never leaves
   the scan (the exchange carries (doc_id, start, 16-byte hash)).
2. DUPLICATED WINDOWS — one hash aggregation: window hashes with
   total occurrence count >= 2 (within- OR cross-document repeats).
3. SPANS — per doc, merge overlapping/adjacent flagged windows into
   maximal spans with gaps-and-islands over a per-doc window (fixed
   window length k means windows merge iff start_next <= start_prev +
   k): two window functions, both partitioned by doc — the shuffle is
   flagged-window-sized, not corpus-sized.
4. REBUILD — drop covered token positions and re-join; the per-doc
   span list is collected into an array column (spans per doc are few
   by construction — they merged), so the rebuild is again map-side.

Every expression is dual-dialect-expressible; the q54 ``substr``
branch value-checks the span table against a DuckDB twin.

Caveat (documented, matching the paper): removal is NOT idempotent in
general — deleting a span can make previously-separated text adjacent,
creating new k-windows a second pass could flag. Production runs one
pass, as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _windows(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, start, whash): every k-token window at stride 1, 1-based
    start positions. Docs shorter than k contribute nothing."""
    return (
        docs.select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    # sequence(1, 0) DESCENDS in Spark — cap the stop
                    # at 1 and filter out-of-range starts instead
                    f"transform(filter(sequence(1,"
                    f" greatest(size(__toks) - {k - 1}, 1)),"
                    f" s -> s <= size(__toks) - {k - 1}),"
                    f" s -> struct(s AS start,"
                    f" md5(array_join(slice(__toks, s, {k}), ' ')) AS whash))"
                )
            ).alias("w"),
        )
        .select(id_col, "w.start", "w.whash")
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, span_start, span_end): maximal merged spans of k-token
    windows whose content occurs >= 2 times in the corpus (1-based
    token positions, end inclusive)."""
    win = _windows(docs, k, id_col, text_col)
    dup = (
        win.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("whash")
    )
    flagged = win.join(dup, "whash", "left_semi")
    return _merge_spans(flagged, k, id_col)


def _merge_spans(flagged: DataFrame, k: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of flagged (id, start) windows into
    maximal (id, span_start, span_end) spans — fixed window length k
    means windows merge iff start_next <= start_prev + k."""
    by_doc = W.partitionBy(id_col).orderBy("start")
    return (
        flagged.withColumn("__prev", F.lag("start").over(by_doc))
        .withColumn(
            "__brk",
            F.when(
                F.col("__prev").isNull()
                | (F.col("start") - F.col("__prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__island", F.sum("__brk").over(by_doc))
        .groupBy(id_col, "__island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + F.lit(k - 1)).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_repeated_substrings(
    docs: DataFrame,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Docs with every repeated span excised: same columns as the
    input, ``text_col`` rebuilt from the kept token positions (other
    columns pass through). One-pass, the ExactSubstr convention. Pass
    an already-computed (ideally persisted) ``repeated_spans`` frame
    to share one fingerprint pass across consumers."""
    if spans is None:
        spans = repeated_spans(docs, k, id_col, text_col)
    spans = (
        spans.groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("__spans")
        )
    )
    others = [c for c in docs.columns if c != text_col]
    rebuilt = (
        f"array_join(transform(filter(sequence(1, size(split({text_col},"
        f" ' '))), p -> __spans IS NULL OR NOT exists(__spans,"
        f" sp -> p >= sp.s AND p <= sp.e)),"
        f" p -> element_at(split({text_col}, ' '), p)), ' ')"
    )
    return (
        docs.join(spans, id_col, "left")
        .select(*others, F.expr(rebuilt).alias(text_col))
        .select(*docs.columns)
    )


def window_hash_index(
    docs: DataFrame,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persistent ExactSubstr index: ONE column (``whash``) of the
    corpus's DISTINCT k-token window fingerprints — 16 bytes per
    distinct window, the substring-grain analog of the digest and
    band indexes (neardup.py). Store parquet; bucketed on ``whash``
    the delta membership probe's index side needs no exchange."""
    return _windows(docs, k, id_col, text_col).select("whash").distinct()


def incremental_repeated_spans(
    delta: DataFrame,
    whash_index: DataFrame | None,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """ExactSubstr for a NEW batch without re-reading the corpus:
    ``(spans, index_delta)``.

    A delta window is flagged iff it occurs >= 2 times WITHIN the
    delta or AT ALL in the index — exactly the one-shot rule's
    delta-side decision over corpus ∪ delta (a unit pins the delta
    restriction of ``repeated_spans(corpus ∪ delta)`` equal to this).
    Like every append-only incremental here, the corpus side is
    settled: a corpus occurrence first duplicated BY the delta is not
    retroactively flagged (the scheduled full re-run's job, not a
    delta decision).

    ``index_delta`` = the delta's distinct window hashes not yet in
    the index; ``index' = index ∪ index_delta`` — after which a
    future exact copy of ANY delta span is caught. ``None``
    bootstraps.

    Scale: delta windows probe the index with one digest-keyed semi
    join (16-byte hashes, never text); everything else is
    delta-proportional — the same delta-cost contract measured for
    the digest/band indexes (SCALE_PROBE).
    """
    win = _windows(delta, k, id_col, text_col)
    dup_within = (
        win.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("whash")
    )
    if whash_index is None:
        flagged = win.join(dup_within, "whash", "left_semi")
        index_delta = win.select("whash").distinct()
    else:
        hits = whash_index.select("whash")
        flagged = win.join(
            dup_within.unionByName(hits).distinct(), "whash", "left_semi"
        )
        index_delta = (
            win.select("whash").distinct().join(hits, "whash", "left_anti")
        )
    return _merge_spans(flagged, k, id_col), index_delta
