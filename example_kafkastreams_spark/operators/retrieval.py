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
    tf, stats = _bm25_postings(docs, id_col, text_col)
    qt = _query_terms_frame(spark, queries)
    # candidate postings: only docs sharing a query term survive
    qtf = tf.join(F.broadcast(qt.select("term").distinct()), "term")
    dfq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = (
        qtf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query", "doc_id", "term", _bm25_term_score(k1, b).alias("ts")
        )
    )
    return _fold_and_rank(scored, top_k)


def _bm25_postings(docs: DataFrame, id_col: str, text_col: str):
    """((doc_id, dl, term, tf) postings, 1-row (n_docs, tot_dl) stats)
    — shared by the in-session scorer and the index builder."""
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
    return tf, stats


def _query_terms_frame(spark, queries: list[str]) -> DataFrame:
    return spark.createDataFrame(
        [(q, t) for q in queries for t in sorted(set(q.split()))],
        "query string, term string",
    )


def _bm25_term_score(k1: float, b: float):
    """The per-term Okapi score as ONE fixed expression tree over
    columns (tf, dl, df_count, n_docs, tot_dl) — shared verbatim by
    the in-session path and the stored-index path, so a loaded index
    serves bit-identical scores."""
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
    return idf * tfnorm


def _fold_and_rank(scored: DataFrame, top_k: int) -> DataFrame:
    """Term-sorted left-to-right '+' fold per (query, doc) (bit-stable
    under any partitioning; terms are unique per pair), then rank by
    (score DESC, doc_id)."""
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


def bm25_index_write(
    docs: DataFrame,
    path: str,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the inverted index — the retrieval twin of the ANN
    build/serve split: tokenize/aggregate the 100 TB corpus ONCE,
    serve queries from the artifact forever.

    Layout under ``path``:

    * ``postings/__bucket=k/`` — (term, doc_id, dl, tf, df_count)
      parquet, partitioned by a DETERMINISTIC term bucket (the shard
      writers' first-8-md5-hex-mod-n formula, on the term), rows
      term-sorted within each bucket. A query touches only its own
      terms' buckets (partition pruning) and inside them only the
      row groups whose term min/max straddle a query term — the
      parquet analog of postings-list seek.
    * ``stats.json`` — corpus constants (n_docs, tot_dl, num_buckets).

    ``df_count`` is computed per term at BUILD time and denormalized
    onto every posting row, so serving needs no corpus-wide aggregate
    — the one piece of global state a posting needs rides with it."""
    import json
    import os

    from .packing import shard_assignment

    tf, stats = _bm25_postings(docs, id_col, text_col)
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    rows = shard_assignment(
        tf.join(dfq, "term"), num_buckets, key_col="term"
    ).withColumnRenamed("__shard", "__bucket")
    (
        rows.drop("__shard_ord")
        .repartition(num_buckets, F.col("__bucket"))
        .sortWithinPartitions("__bucket", "term")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(os.path.join(path, "postings"))
    )
    st = stats.first()
    with open(os.path.join(path, "stats.json"), "w") as f:
        json.dump(
            {
                "n_docs": int(st["n_docs"]),
                "tot_dl": int(st["tot_dl"]),
                "num_buckets": num_buckets,
            },
            f,
        )


def bm25_index_query(
    spark,
    path: str,
    queries: list[str],
    top_k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``top_k`` docs per query against the stored inverted index
    — bit-identical to ``bm25_top_docs`` on the build corpus (shared
    ``_bm25_term_score`` expression + shared fold; df/n_docs/tot_dl
    are the same numbers the in-session path derives).

    Serving shape: the query's term set prunes the scan twice before
    any row is read — bucket partitions (computed driver-side with
    the same md5 formula) and an ``In(term)`` pushed filter for
    row-group skipping inside them. Everything after the scan is
    candidate-sized."""
    import hashlib
    import json
    import os

    with open(os.path.join(path, "stats.json")) as f:
        st = json.load(f)
    terms = sorted({t for q in queries for t in q.split()})
    buckets = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            % st["num_buckets"]
            for t in terms
        }
    )
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("__bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    qt = _query_terms_frame(spark, queries)
    scored = (
        postings.join(F.broadcast(qt), "term")
        .withColumns(
            {
                "n_docs": F.lit(st["n_docs"]),
                "tot_dl": F.lit(st["tot_dl"]),
            }
        )
        .select(
            "query", "doc_id", "term", _bm25_term_score(k1, b).alias("ts")
        )
    )
    return _fold_and_rank(scored, top_k)


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
