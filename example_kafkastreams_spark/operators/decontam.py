"""Benchmark decontamination — n-gram overlap against a held-out set.

A training corpus must not contain the benchmarks the model will be
evaluated on, so large-scale pipelines run an n-gram-overlap
decontamination stage: any training document sharing enough distinct
n-token shingles with any benchmark document is flagged and dropped.
This is the set-overlap cousin of the near-dup operators (the
reference's dedup family, DeduplicationExample.scala:126-142,
generalized from "same key seen before" to "shares a shingle with a
blocklist") — the blocklist is just the other side of the join.

100 TB shape:
- The benchmark side is tiny relative to the corpus (eval sets are
  MBs), so its DISTINCT shingle set is broadcast — the corpus is
  NEVER shuffled for matching. Corpus docs explode their shingles
  map-side and probe the broadcast hash table in the same stage as
  the scan.
- Only matching (doc_id, gram) rows survive the probe — rare by
  construction — so the per-doc hit count is a partial-agg exchange
  over a vanishing fraction of the data.
- The contaminated-id list that results is again small, so the final
  flag/drop join broadcasts it back against the corpus: end to end,
  zero shuffles of corpus rows.
- If the benchmark shingle set ever outgrows broadcast (thousands of
  eval suites), the same plan degrades gracefully to a shuffle
  hash join on the gram key — set ``broadcast=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P


def benchmark_shingles(
    benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """DISTINCT n-token shingle set of the benchmark corpus — one
    column ``gram``. Distinct per doc comes free from ``P.shingles``;
    the cross-doc distinct is one small-side exchange."""
    return benchmark.select(
        F.explode(F.expr(P.shingles(text_col, n, P.SPARK))).alias("gram")
    ).distinct()


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(id, n_contaminated) for every doc sharing ≥1 distinct n-token
    shingle with the benchmark set; docs with zero overlap are absent
    (keeps the result proportional to the contamination, not the
    corpus). ``n_contaminated`` counts the doc's DISTINCT overlapping
    shingles — `P.shingles` is per-doc distinct, so no double count.
    """
    bench = benchmark_shingles(benchmark, n, text_col)
    if broadcast:
        bench = F.broadcast(bench)
    grams = docs.select(
        F.col(id_col),
        F.explode(F.expr(P.shingles(text_col, n, P.SPARK))).alias("gram"),
    )
    return (
        grams.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


def contamination_report_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    m_bits: int | None = None,
    k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefiltered contamination check: the benchmark shingle
    set folds into an exact-reproducible Bloom filter
    (operators.sketches — md5 positions, 32-bit packed words) whose
    word vector inlines into the scan as a LITERAL array, so the per-
    doc shingle probe is a pure map-side higher-order-function — no
    join, no explode, no shuffle on the corpus side AT ALL (the exact
    report broadcasts the shingle set and still joins; here the whole
    filter is ~KB of plan literals).

    Bloom semantics: no false negatives — every exactly-contaminated
    doc is flagged; a small FPR-bounded superset may flag extra docs,
    which the standard pipeline routes to the exact check. Returns one
    row per doc: (id, n_hits, contaminated) where ``n_hits`` counts
    the doc's distinct shingles the filter accepts.
    """
    from .sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_probe_expr,
        bloom_vector,
        bloom_words,
    )

    m_bits = BLOOM_M if m_bits is None else m_bits
    k = BLOOM_K if k is None else k
    bench = benchmark_shingles(benchmark, n, text_col).withColumnRenamed(
        "gram", "v"
    )
    vec = bloom_vector(bloom_words(bench, "v", m_bits, k), m_bits)
    probe = bloom_probe_expr("t", vec, m_bits, k)
    n_hits = F.expr(
        f"size(filter({P.shingles(text_col, n, P.SPARK)}, t -> {probe}))"
    ).cast("long")
    return docs.select(
        F.col(id_col),
        n_hits.alias("n_hits"),
    ).withColumn("contaminated", F.col("n_hits") > 0)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Corpus minus contaminated docs (≥ ``min_hits`` overlapping
    shingles). The contaminated-id list is small, so the anti join
    broadcasts it — corpus rows never shuffle."""
    bad = (
        contamination_report(docs, benchmark, n, id_col, text_col, broadcast)
        .filter(F.col("n_contaminated") >= min_hits)
        .select(id_col)
    )
    if broadcast:
        bad = F.broadcast(bad)
    return docs.join(bad, id_col, "left_anti")


def contamination_report_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(id, n_band_hits) for docs whose MinHash signature shares ≥1
    LSH band with ANY benchmark doc — paraphrase-level contamination
    that exact shingle overlap misses (a rephrased eval question keeps
    most of its shingle SET, so signatures still band-collide, while
    no n consecutive tokens survive verbatim).

    Same broadcast discipline as the exact report: the benchmark's
    distinct (band_idx, band_key) set broadcasts (≤ bands rows per
    benchmark doc), the corpus computes its own signature map-side in
    the scan and probes — the corpus never crosses a hash exchange.
    ``n_band_hits`` ∈ [1, bands]: the number of its bands found in the
    benchmark set (a coarse confidence signal, NOT a Jaccard
    estimate; chase precision by verifying flagged docs with
    ``neardup.ngram_jaccard_pairs`` semantics against the benchmark).
    """
    from .neardup import _rebalance, lsh_bands, with_minhash

    rows_per_band = num_hashes // bands
    bench_bands = (
        lsh_bands(
            with_minhash(
                benchmark, id_col=id_col, text_col=text_col,
                num_hashes=num_hashes, shingle_n=shingle_n,
            ),
            id_col, bands, rows_per_band,
        )
        .select("band_idx", "band_key")
        .distinct()
    )
    if broadcast:
        bench_bands = F.broadcast(bench_bands)
    corpus_bands = lsh_bands(
        with_minhash(
            _rebalance(docs, id_col), id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
        ),
        id_col, bands, rows_per_band,
    )
    return (
        corpus_bands.join(bench_bands, ["band_idx", "band_key"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    min_band_hits: int = 1,
    id_col: str = "doc_id",
    broadcast: bool = True,
    **kwargs,
) -> DataFrame:
    """Corpus minus fuzzy-contaminated docs (≥ ``min_band_hits``
    band collisions with the benchmark); same broadcast-back anti
    join as ``decontaminate``."""
    bad = (
        contamination_report_fuzzy(
            docs, benchmark, id_col=id_col, broadcast=broadcast, **kwargs
        )
        .filter(F.col("n_band_hits") >= min_band_hits)
        .select(id_col)
    )
    if broadcast:
        bad = F.broadcast(bad)
    return docs.join(bad, id_col, "left_anti")
