"""Document chunking and term weighting (SURVEY.md §2.9 extensions).

An LLM training pipeline slices documents into overlapping token
windows (context-length packing) and ranks terms for filtering /
topic heuristics. Both stages are pure column expressions + one
explode — map-side until the (small) aggregations, so they scale with
the scan.

Chunking layout: windows of ``chunk_size`` tokens starting every
``stride`` tokens (overlap = chunk_size - stride); a trailing window
shorter than the chunk size is kept — every token belongs to ≥1 chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions import portable as P


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — overlapping token windows.

    Tokens materialize in their own projection, the start offsets
    explode map-side, and each chunk is a slice+join over the shared
    token array: no shuffle anywhere, output size ≈ |tokens|/stride
    rows per doc. The 100 TB shape is exactly this (chunking is
    embarrassingly parallel); downstream repartitioning is the
    consumer's choice.

    ``carry_cols``: extra columns replicated onto every chunk row —
    e.g. the event-time column a downstream streaming stage (the
    packer's watermark/timeout) keys on.
    """
    S = P.SPARK
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.expr(P.split_ws(text_col, S)).alias("toks"),
    )
    return chunk_token_arrays(
        toks, id_col=id_col, tokens_col="toks",
        chunk_size=chunk_size, stride=stride, carry_cols=carry_cols,
    )


def chunk_token_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    chunk_size: int = 32,
    stride: int = 24,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``chunk_documents`` over a PRE-TOKENIZED column — the chunking
    grain for any tokenizer whose output isn't whitespace words:
    ``operators.bpe.bpe_encode``'s subword stream plugs in here, so
    chunk/pack budgets count REAL model tokens instead of the regex
    approximation. Same zero-shuffle explode+slice plan; the rejoined
    ``chunk_text`` concatenates tokens with spaces (for subword tokens
    the token ARRAY boundary, not the string, is the contract).
    """
    S = P.SPARK
    n = P.size_(tokens_col, S)
    starts = P.seq_step("1", n, stride, S)
    ex = df.select(
        id_col,
        *carry_cols,
        tokens_col,
        F.explode(F.expr(starts)).alias("start"),
    )
    chunk_text = P.join_str(
        P.slice_(tokens_col, "start", chunk_size, S), " ", S
    )
    return ex.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        (F.expr(P.idiv("start - 1", str(stride), S)) + 1).alias("chunk_idx"),
        F.expr(chunk_text).alias("chunk_text"),
        F.least(
            F.lit(chunk_size), F.expr(n) - F.col("start") + 1
        ).alias("n_tokens"),
    )


def term_counts(tokens_col):
    """array<struct<term string, tf bigint>> — per-row term frequencies
    as a pure JVM expression: run-length encode the SORTED token array
    with one ``aggregate`` fold. Exactly the multiset the old
    explode → groupBy(id, term) pipeline produced, but computed
    MAP-SIDE, so the corpus-sized (doc, term) table never has to cross
    an exchange just to be counted (guide §2.3/§2.4): downstream
    term/doc aggregations over the exploded result partial-combine to
    per-partition distinct terms / docs before any shuffle."""
    toks = F.array_sort(
        tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.array().cast("array<struct<term:string,tf:bigint>>").alias("out"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cnt"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("cnt"),
            F.when(same, acc["out"])
            .otherwise(
                F.when(
                    acc["prev"].isNull(), acc["out"]
                ).otherwise(
                    F.concat(
                        acc["out"],
                        F.array(
                            F.struct(
                                acc["prev"].alias("term"),
                                acc["cnt"].alias("tf"),
                            )
                        ),
                    )
                )
            )
            .alias("out"),
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        acc["prev"].alias("term"), acc["cnt"].alias("tf")
                    )
                ),
            )
        )

    return F.aggregate(toks, init, step, finish)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, top_term, tf_count, tfidf) — each document's highest-tf-idf
    term, ties broken lexicographically.

    Shape: per-doc term counts fold MAP-SIDE (``term_counts`` — no
    corpus-sized exchange to count tf), document frequency as one
    term-keyed hash agg over the already-unique (doc, term) pairs
    (partial-combines to per-partition distinct terms), broadcast back,
    then the per-doc argmax as a ``min_by`` hash agg — partial
    aggregation reduces each map partition to one candidate row per doc
    before the exchange, where the former row_number window shuffled
    every (doc, term) score row. idf = ln((N+1)/(df+1)), one IEEE op
    sequence shared with the oracle; the argmax ordering
    (-tfidf, term) is the window's (tfidf DESC, term ASC) exactly
    (IEEE negation is bit-exact and scores are finite).
    """
    tf = docs.select(
        F.col(id_col),
        F.explode(
            term_counts(F.expr(P.split_ws(text_col, P.SPARK)))
        ).alias("__tc"),
    ).select(
        id_col,
        F.col("__tc.term").alias("term"),
        F.col("__tc.tf").alias("tf_count"),
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf_raw",
            F.expr(
                "CAST(tf_count AS DOUBLE)"
                " * ln((n_docs + 1.0) / (df_count + 1.0))"
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct("term", "tf_count", "tfidf_raw"),
                F.struct(
                    (-F.col("tfidf_raw")).alias("neg"),
                    F.col("term"),
                ),
            ).alias("__w")
        )
        .select(
            id_col,
            F.col("__w.term").alias("top_term"),
            F.col("__w.tf_count").alias("tf_count"),
            F.round(F.col("__w.tfidf_raw"), 6).alias("tfidf"),
        )
    )


def dedup_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Passage-level exact dedup: one survivor per distinct chunk text.

    Document-level dedup misses boilerplate PASSAGES repeated across
    otherwise-distinct documents (headers, license blocks, navigation
    text) — the regime substring-dedup work targets. Chunk the corpus,
    dedup the chunks: digest-keyed like ``neardup.exact_text_dedup``,
    survivor = smallest (doc_id, chunk_idx), deterministic under any
    partitioning. The result carries the surviving text for direct
    training use, so unlike exact_text_dedup the exchange is not
    text-free — but the map-side partial agg collapses duplicates
    first, so each distinct passage's bytes cross the wire at most
    once per map partition (duplicate-heavy corpora shuffle far less
    than the chunk table; drop the text column before the groupBy for
    the fully digest-only variant).

    Returns (id, idx, chunk_text, n_copies); ``n_copies`` > 1 marks
    cross-corpus boilerplate, so a caller can also use this as a
    boilerplate DETECTOR and drop high-multiplicity passages entirely.
    """
    digest = chunks.select(
        F.md5(F.col(text_col)).alias("chunk_hash"),
        F.struct(F.col(id_col), F.col(idx_col)).alias("__coord"),
        F.col(text_col),
    )
    return (
        digest.groupBy("chunk_hash")
        .agg(
            F.min("__coord").alias("__w"),
            F.count(F.lit(1)).alias("n_copies"),
            # all rows in a group share the text; min_by pins the
            # survivor's copy deterministically
            F.min_by(text_col, "__coord").alias(text_col),
        )
        .select(
            F.col("__w")[id_col].alias(id_col),
            F.col("__w")[idx_col].alias(idx_col),
            text_col,
            "n_copies",
        )
    )


def chunk_loss_masks(
    chunks: DataFrame,
    spans: DataFrame,
    stride: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, mask_start, mask_end) — chunk-LOCAL 1-based
    inclusive token ranges covered by corpus-repeated spans: the
    mask-instead-of-drop dedup policy. ExactSubstr-style span REMOVAL
    (``substr_dedup.remove_repeated_substrings``) rewrites documents
    and can splice unrelated text across a cut; masking keeps the
    tokens as context but zeroes their loss, which is what a trainer
    actually needs from the span table. This operator translates the
    document-grain span table into the chunk grain the packed training
    sequences are built from.

    Chunk k of a ``chunk_documents(stride=...)`` table covers global
    token positions [(k−1)·stride + 1, (k−1)·stride + n_tokens]; a
    span [s, e] overlaps iff s ≤ chunk_end AND e ≥ chunk_start, and
    the masked chunk-local range is the clamped intersection shifted
    by the chunk start. Spans per doc are disjoint (gaps-and-islands
    merged), so per-chunk mask rows never overlap and their lengths
    sum exactly.

    Scale shape (100 TB): one equi-join on the doc id — chunk and
    span tables are both id-keyed; per-doc fan-out is chunks × spans
    of that doc (spans are few after merging). No text moves: the
    chunk text column is not read.
    """
    cstart = (F.col("chunk_idx") - F.lit(1)) * F.lit(stride) + F.lit(1)
    c = chunks.select(
        F.col(id_col),
        "chunk_idx",
        cstart.alias("__cs"),
        (cstart + F.col("n_tokens") - F.lit(1)).alias("__ce"),
    )
    return (
        c.join(spans, id_col)
        .filter(
            (F.col("span_start") <= F.col("__ce"))
            & (F.col("span_end") >= F.col("__cs"))
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            (
                F.greatest(F.col("span_start"), F.col("__cs"))
                - F.col("__cs") + F.lit(1)
            ).alias("mask_start"),
            (
                F.least(F.col("span_end"), F.col("__ce"))
                - F.col("__cs") + F.lit(1)
            ).alias("mask_end"),
        )
    )
