"""Corpus-trained n-gram LM quality scoring (CCNet-style).

Production pretraining pipelines score documents with a cheap language
model (CCNet uses KenLM perplexity) and filter or bucket on the score.
This operator builds the statistical core of that stage entirely
inside the engine: a bigram model TRAINED ON THE CORPUS ITSELF (one
aggregation), then a per-document mean transition probability — a
perplexity proxy that needs no external model artifact and no UDF.

Determinism contract (the driver hashes exact doubles): every
per-bigram probability is one IEEE division of two integer counts —
bit-identical in any engine — and the per-doc mean avoids
order-dependent double summation by scaling each probability to a
30-bit integer (round(p·1e9), p ≤ 1) and summing LONGS, which is
exact and commutative (headroom: ~2^33 scaled-count mass per doc
before 2^63 overflows — far beyond any document's bigram count). The
only double ops are per-row single multiply/divide/round — no
accumulation in floating point anywhere.

100 TB shape:
- ONE explode over the corpus: the per-(doc, gram) count relation is
  the smallest sufficient statistic for everything downstream and is
  already collapsed by the map-side partial agg before its exchange.
- The model is vocabulary-sized (≪ corpus); scoring joins it back to
  that relation — broadcast when it fits (default), or a shuffle
  hash join on the gram key for web-scale vocabularies
  (``broadcast=False``).
- ``top_bigram`` (the Gopher "most common n-gram" statistic) reuses
  the same relation: a per-doc max over already-partial-aggregated
  counts — no second pass over the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as P
from .cache import persist_tracked

_SCALE = 1_000_000_000  # p ∈ [0,1] → round(p·1e9) fits 30 bits


def _exploded_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, gram) — ordered, non-distinct token bigrams, map-side."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.expr(P.token_ngrams(text_col, 2, P.SPARK))
        ).alias("gram"),
    )


def _model_from_counts(counts: DataFrame) -> DataFrame:
    """(gram, p) from a (gram, c_bg) relation: p = c_bg / Σ c_bg over
    the gram's prefix token — the conditional transition probability
    p(w₂ | w₁), one exact division of two longs."""
    counts = counts.withColumn("prefix", F.split(F.col("gram"), " ")[0])
    prefix = counts.groupBy("prefix").agg(F.sum("c_bg").alias("c_pref"))
    return counts.join(prefix, "prefix").select(
        "gram",
        (
            F.col("c_bg").cast("double") / F.col("c_pref").cast("double")
        ).alias("p"),
    )


def bigram_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gram, p): the corpus bigram transition distribution."""
    return _model_from_counts(
        _exploded_bigrams(docs, id_col, text_col)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_bg"))
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Per-doc LM statistics: (id, lm_score, n_bigrams, top_bigram,
    top_bigram_count, top_bigram_frac).

    ``lm_score`` = mean transition probability over the doc's bigram
    stream (higher = more typical of the training corpus; boilerplate
    scores near 1, aleatoric noise near 0). ``top_bigram`` columns are
    the Gopher most-common-n-gram statistic (tie-break:
    lexicographically smallest gram). Docs with < 2 tokens have no
    bigrams and are absent — the honest domain of a
    transition-probability score.

    ``model``: an EXTERNAL (gram, p) model — e.g. last week's
    ``bigram_model`` output — scores tomorrow's corpus against
    yesterday's distribution. Grams absent from an external model are
    OUT-OF-VOCABULARY: they contribute probability 0 to the mean (the
    natural unsmoothed floor) and still count in ``n_bigrams``, so an
    all-OOV doc scores 0.0 rather than vanishing. With the default
    corpus-trained model the join is lossless and the floor never
    fires.
    """
    # ONE explode over the corpus: the (doc, gram, count) relation is
    # the smallest sufficient statistic for everything downstream —
    # the model (Σ_doc c per gram), the per-doc score (each of a doc's
    # c identical instances contributes the same scaled integer, so
    # Σ_instances round(p·1e9) ≡ c·round(p·1e9) exactly), and the
    # top-gram pick. At 100 TB this replaces three passes over the
    # exploded gram stream with one.
    per_gram = persist_tracked(
        _exploded_bigrams(docs, id_col, text_col)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if model is None:
        model = _model_from_counts(
            per_gram.groupBy("gram").agg(F.sum("c").alias("c_bg"))
        )
    if broadcast:
        model = F.broadcast(model)
    # Left join: lossless for a corpus-trained model; OOV floor (p=0,
    # still counted) for an external one — see docstring.
    scored = per_gram.join(model, "gram", "left").groupBy(id_col).agg(
        F.sum(
            F.col("c")
            * F.coalesce(
                F.round(F.col("p") * _SCALE, 0).cast("long"), F.lit(0)
            )
        ).alias("p_scaled_sum"),
        F.sum("c").alias("n_bigrams"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("gram"))
    top = (
        per_gram.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("gram").alias("top_bigram"),
            F.col("c").alias("top_bigram_count"),
        )
    )
    return scored.join(top, id_col).select(
        F.col(id_col),
        F.expr(
            P.round_dbl(
                f"CAST(p_scaled_sum AS DOUBLE)"
                f" / CAST({_SCALE} AS DOUBLE) / n_bigrams",
                6,
                P.SPARK,
            )
        ).alias("lm_score"),
        "n_bigrams",
        "top_bigram",
        "top_bigram_count",
        F.expr(
            P.round_dbl(
                "CAST(top_bigram_count AS DOUBLE) / n_bigrams", 6, P.SPARK
            )
        ).alias("top_bigram_frac"),
    )
