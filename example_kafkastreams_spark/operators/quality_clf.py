"""Hashing-trick linear quality classifier (fastText/DCLM shape).

The model-based filter every modern pretraining pipeline runs (CCNet's
LM perplexity gate, DCLM's fastText classifier, Llama-style quality
scoring): train a linear model over hashed token buckets from seed
labels, then score every document and keep the high scorers. Public
shape: Weinberger et al. 2009 (feature hashing), Joulin et al. 2016
(fastText's hashed bag-of-words + linear layer).

Everything is exact integer / single-IEEE-op math so the driver oracle
can re-derive the model IN SQL and hash-match the scores bit-for-bit:

* bucket  = hash32(token) % B            (md5-based, dual-dialect)
* weight  = floor(1e6 * (c_pos+1)/(c_pos+c_neg+2)) - 500000
            — a Laplace-smoothed P(pos | bucket) estimate, centered
            and scaled to BIGINT. The division is one IEEE binary64 op
            on exact integer-valued operands; floor (not round) avoids
            the engines' half-up-vs-half-even tie split.
* score   = SUM over token occurrences of the bucket weight — a pure
            BIGINT sum, order-independent.

Scale shape (100 TB): training is ONE explode + hash aggregation that
outputs at most B rows (the distributed histogram every token-stat op
here uses); map-side partial aggregation collapses each partition to
≤ B rows before the shuffle. Scoring doesn't join, doesn't explode and
doesn't shuffle AT ALL: the trained weight vector is collected (bounded
by construction: ≤ B rows) and folded into the plan as a LITERAL array
— `aggregate(transform(tokens, t -> w[hash(t) % B]), 0, +)` inlines
into the scan projection, so the classifier rides whole-stage codegen
like any other column expression. The model ships in the plan itself —
cheaper than a broadcast join, and the scan stays one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P

N_BUCKETS = 256
W_SCALE = 1_000_000
W_CENTER = 500_000


def bucket_sql(var: str, n_buckets: int, d: str) -> str:
    """Hashed feature bucket of a token expression — nonnegative in
    both dialects (hash32 is the first 8 md5 hex digits, >= 0)."""
    return f"({P.token_hash32(var, d)} % {n_buckets})"


def weight_sql(c_pos: str, c_neg: str) -> str:
    """Centered scaled Laplace log-odds surrogate (dialect-free: every
    function here exists identically in Spark SQL and DuckDB)."""
    return (
        f"CAST(floor((CAST(({c_pos}) + 1 AS DOUBLE)"
        f" / CAST(({c_pos}) + ({c_neg}) + 2 AS DOUBLE))"
        f" * {W_SCALE}) AS BIGINT) - {W_CENTER}"
    )


def train_hashed_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Train: per-bucket positive/negative token-occurrence counts →
    centered integer weights. Returns ≤ ``n_buckets`` rows
    (bucket BIGINT, w BIGINT)."""
    toks = F.expr(P.split_ws(text_col, P.SPARK))
    ex = docs.select(
        F.col(label_col).alias("__pos"), F.explode(toks).alias("t")
    )
    bucket = F.expr(bucket_sql("t", n_buckets, P.SPARK))
    return (
        ex.groupBy(bucket.alias("bucket"))
        .agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
        )
        .select("bucket", F.expr(weight_sql("c_pos", "c_neg")).alias("w"))
    )


def weights_vector(weights: DataFrame, n_buckets: int = N_BUCKETS) -> list[int]:
    """Collect the trained model into a dense weight vector. The
    collect is bounded BY CONSTRUCTION (groupBy on hash % n_buckets
    cannot emit more than n_buckets rows); buckets no training token
    hit default to weight 0 — the same value an unseen bucket's
    Laplace estimate would center to."""
    w = [0] * n_buckets
    for r in weights.collect():
        w[int(r["bucket"])] = int(r["w"])
    return w


def score_inline(
    docs: DataFrame,
    w: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Score with the weight vector folded into the plan as a literal
    array: per-doc ``clf_score`` (BIGINT sum of bucket weights over
    token occurrences), ``clf_n_tokens`` and ``clf_keep``
    (mean weight > 0, i.e. score > 0). Zero joins, zero shuffles —
    one map-side expression over the scan."""
    n_buckets = len(w)
    arr = "array(" + ",".join(f"{x}L" for x in w) + ")"
    score = F.expr(
        f"aggregate(transform({P.split_ws(text_col, P.SPARK)},"
        f" t -> element_at({arr},"
        f" CAST({bucket_sql('t', n_buckets, P.SPARK)} AS INT) + 1)),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return docs.select(
        *docs.columns,
        score.alias("clf_score"),
        F.expr(
            P.size_(P.split_ws(text_col, P.SPARK), P.SPARK)
        ).cast("long").alias("clf_n_tokens"),
        (score > 0).alias("clf_keep"),
    )


def train_score_sql(
    label_pred: str,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    d: str = P.DUCK,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """The oracle twin: re-derive the model AND the scores in SQL
    (join-formulated — the oracle checks VALUES; the literal-array
    inlining is the Spark plan's execution strategy, not part of the
    semantics). Returns a SELECT yielding (id, clf_score,
    clf_n_tokens, clf_keep)."""
    toks = P.split_ws(text_col, d)
    if d == P.DUCK:
        tok_rows = (
            f"SELECT {id_col}, unnest({toks}) AS t FROM {table}"
        )
    else:
        tok_rows = (
            f"SELECT {id_col}, explode({toks}) AS t FROM {table}"
        )
    return f"""
    WITH lab AS (
      SELECT {id_col}, ({label_pred}) AS pos FROM {table}
    ),
    tok AS ({tok_rows}),
    bt AS (
      SELECT tok.{id_col}, lab.pos,
             {bucket_sql('t', n_buckets, d)} AS bucket
      FROM tok JOIN lab ON tok.{id_col} = lab.{id_col}
    ),
    hist AS (
      SELECT bucket,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
      FROM bt GROUP BY bucket
    ),
    w AS (SELECT bucket, {weight_sql('c_pos', 'c_neg')} AS w FROM hist),
    scored AS (
      SELECT bt.{id_col}, SUM(w.w) AS clf_score,
             COUNT(*) AS clf_n_tokens
      FROM bt JOIN w ON bt.bucket = w.bucket
      GROUP BY bt.{id_col}
    )
    SELECT {id_col}, clf_score, clf_n_tokens,
           clf_score > 0 AS clf_keep
    FROM scored
    """


CALIB_WIDTH = 64
CALIB_CLAMP = 8


def calibration_bins(
    scored: DataFrame,
    pos_col: str = "__pos",
    score_col: str = "clf_score",
    width: int = CALIB_WIDTH,
    clamp: int = CALIB_CLAMP,
) -> DataFrame:
    """Reliability table for a model-based filter: fixed-width bins
    over the INTEGER classifier score (floor of one exact IEEE
    division, clamped tails — the histogram_sketch bucket discipline,
    so the bin is a pure map-side expression and the aggregation
    exchange carries ≤ partitions·(2·clamp+1) rows at any corpus
    size), with per-bin volume, positive-label count, exact score
    mass, and the empirical positive rate (ONE division of exact
    integers). A well-calibrated filter shows pos_rate rising
    monotonically with the score bin; a flat table means the score
    carries no signal and the keep threshold is arbitrary — the audit
    a release runs before trusting a learned quality gate.

    Returns (bin, n, n_pos, sum_score, pos_rate)."""
    bin_expr = F.expr(
        f"LEAST(GREATEST(CAST(FLOOR(CAST({score_col} AS DOUBLE)"
        f" / {width}) AS BIGINT), {-clamp}), {clamp})"
    )
    return (
        scored.select(
            bin_expr.alias("bin"),
            F.when(F.col(pos_col), 1).otherwise(0).alias("__p"),
            F.col(score_col),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__p").cast("bigint").alias("n_pos"),
            F.sum(score_col).cast("bigint").alias("sum_score"),
        )
        .withColumn(
            "pos_rate",
            F.col("n_pos").cast("double") / F.col("n").cast("double"),
        )
    )
