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
