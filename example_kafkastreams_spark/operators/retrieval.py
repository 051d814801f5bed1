"""BM25 full-text retrieval — the ranked-search member of the text
family (TF-IDF's retrieval twin; Robertson & Spärck Jones BM25, the
Okapi formulation with the standard +1 idf floor so scores stay
positive even for terms in most documents).

Scale shape — classic inverted-index scoring as ONE term-keyed join:

* the postings table (doc, term, tf) aggregates map-side per
  partition before its one (doc, term) exchange (tf is additive);
* the query set is tiny by contract, so the exploded (query, term)
  table BROADCASTS — the corpus never shuffles for retrieval;
* postings prune to CANDIDATES (docs sharing >= 1 query term) via the
  broadcast semi join BEFORE any scoring work, so the per-(query,
  doc) score aggregation shuffles candidate-sized data (sum of the
  query terms' posting lists), never corpus-sized;
* df for query terms is computed from the candidate postings
  themselves (df(t) = |postings of t|, and the candidate set contains
  every posting of every query term) — a handful of rows, broadcast
  back; the corpus-wide doc count / average length is a 1-row
  aggregate cross-joined in (the q55 ``CROSS JOIN n`` pattern).

Cross-engine determinism (the registry rules): every per-term score
is one fixed IEEE expression tree over (tf, df, dl, N, tot_dl) —
identical operand order in the DuckDB twin — and the per-(query, doc)
sum folds the matched terms' scores IN TERM ORDER, left to right
(``F.aggregate`` over the term-sorted struct array ⇔ DuckDB
``list_reduce(list_prepend(0.0, list(ts ORDER BY term)))``), so the
double is bit-identical no matter how Spark partitions the
aggregation. Ranks tie-break on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_top_docs(
    docs: DataFrame,
    queries: list[str],
    top_k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query, doc_id, rank, score) — top-``top_k`` documents per query
    by BM25, whitespace tokens, ranks 1..top_k (ties → lower doc id).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), summed over q's
    DISTINCT terms present in d, in term order.
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("tot_dl"),
    )
    tf = (
        toks.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qt = spark.createDataFrame(
        [(q, t) for q in queries for t in sorted(set(q.split()))],
        "query string, term string",
    )
    # candidate postings: only docs sharing a query term survive
    qtf = tf.join(F.broadcast(qt.select("term").distinct()), "term")
    dfq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))

    avgdl = F.col("tot_dl") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df_count") + F.lit(0.5))
        / (F.col("df_count") + F.lit(0.5))
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl")) / avgdl)
    )
    scored = (
        qtf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select("query", "doc_id", "term", (idf * tfnorm).alias("ts"))
    )
    # ordered fold: term-sorted left-to-right '+' chain (bit-stable
    # under any partitioning; terms are unique per (query, doc))
    agg = scored.groupBy("query", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "ts"))),
                lambda s: s["ts"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query", "doc_id", "rank", "score")
    )


def term_overlap_top_docs(
    docs: DataFrame,
    queries: list[str],
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query, doc_id, rank, hits) — the integer-exact lexical
    baseline ranker: total occurrences of the query's distinct terms
    in the document (ties → lower doc id). Same inverted-index shape
    as BM25 minus the statistics; exists mostly as the second voice
    for ``rrf_fuse`` and as an exact-arithmetic cross-check."""
    spark = docs.sparkSession
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qt = spark.createDataFrame(
        [(q, t) for q in queries for t in sorted(set(q.split()))],
        "query string, term string",
    )
    agg = (
        tf.join(F.broadcast(qt), "term")
        .groupBy("query", "doc_id")
        .agg(F.sum("tf").alias("hits"))
    )
    w = Window.partitionBy("query").orderBy(F.desc("hits"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query", "doc_id", "rank", "hits")
    )


RRF_K = 60


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = RRF_K,
    top_k: int | None = None,
) -> DataFrame:
    """(query, doc_id, rank, score) — reciprocal rank fusion (Cormack
    et al. 2009): score(q, d) = Σ_r 1/(k + rank_r(d)), summed over the
    rankers that listed d for q. Ranker-agnostic: each input is any
    (query, doc_id, rank) frame — BM25, term overlap, an ANN ranking
    mapped onto doc ids — making this the hybrid-retrieval combiner.

    Scale shape: inputs are top-k-bounded PER QUERY by construction
    (they are rankings), so the union and the (query, doc) aggregation
    are candidate-sized — never corpus-sized — regardless of corpus
    growth. Determinism: contributions fold in RANKER-INDEX order,
    left to right (the BM25 term-fold discipline), and the fused rank
    tie-breaks on doc id; with ≤ a handful of rankers the double is
    bit-stable under any partitioning."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            "query",
            "doc_id",
            F.lit(i).alias("ridx"),
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("contrib"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    agg = tagged.groupBy("query", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ridx", "contrib"))),
                lambda s: s["contrib"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    out = agg.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.select("query", "doc_id", "rank", "score")
