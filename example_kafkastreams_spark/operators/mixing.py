"""Deterministic domain mixing — resample a corpus to target source
weights.

Pretraining runs prescribe a mixture ("40% web, 30% code, 30% books");
the raw corpus never matches it. Down-sample each over-represented
source to hit the target ratios without up-sampling anything:

    cap   = min over sources of n_s / w_s     (the binding source)
    keep_s = w_s * cap                        (rows to keep from s)
    rate_s = keep_s / n_s                     (acceptance rate, <= 1)

A row survives iff hash(doc_id) mod M < rate_s * M — the same
reproducible hash-bucket sampling as q34: per-row map-side filter,
stable under repartitioning, re-runnable, cross-engine verifiable.
No TABLESAMPLE/rand(): those are seed- and partitioning-dependent and
can never be oracle-checked.

Scale shape: one tiny groupBy(source) count (S rows, S = number of
sources), computed driver-side once and folded into the filter as
LITERAL rates — the 100 TB scan then carries a pure map-side
predicate; no join, no shuffle, nothing but the scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P

_M = 1 << 32


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal with embedded quotes doubled —
    source names are data, not trusted SQL."""
    return "'" + s.replace("'", "''") + "'"


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source acceptance rates hitting ``weights`` exactly at the
    binding source (rate 1.0) and down-sampling the rest."""
    if not weights:
        raise ValueError("weights must be a non-empty {source: weight} dict")
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"weighted sources absent from corpus: {sorted(missing)}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    total = sum(weights.values())
    norm = {s: w / total for s, w in weights.items()}
    cap = min(counts[s] / w for s, w in norm.items())
    return {s: (norm[s] * cap) / counts[s] for s in norm}


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows surviving the mixture filter; sources without a weight drop.

    Deterministic in the data (not the partitioning): survival depends
    only on (id, source, weights).
    """
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[source_col] in weights
    }
    rates = mixture_rates(counts, weights)
    return _filter_by_rates(docs, rates, source_col, id_col)


def _source_counts(
    docs: DataFrame, source_col: str
) -> dict[str, int]:
    """Per-source row counts, NULL sources excluded — a NULL source
    can never survive the equality filter branches, so letting it
    into the rate derivation would both drop its rows silently AND
    depress every real source's rate through a phantom binding
    source."""
    return {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[source_col] is not None
    }


def _filter_by_rates(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str,
    id_col: str,
) -> DataFrame:
    """The shared map-side survivor filter: hash(id) mod 2^32 against
    each source's floor(rate·2^32) literal threshold (sources not in
    ``rates`` drop). Rates ≥ 1.0 accept every row of their source.

    Built as ONE SQL string parsed by a single F.expr — the Column-op
    loop it replaces cost ~8 py4j roundtrips per source per call
    (measured: 2,500 of q61's 7,300 build roundtrips); the parsed
    tree is identical, so the survivor set is bit-for-bit the same
    (mix_sources_sql is the same construction in the DuckDB
    dialect)."""
    h = f"({P.token_hash32(f'CAST({id_col} AS STRING)', P.SPARK)} % {_M})"
    branches = [
        f"({source_col} = {_sql_str(s)} AND {h} < {int(rate * _M)})"
        for s, rate in rates.items()
    ]
    return docs.filter(F.expr(" OR ".join(branches)))


def mix_sources_sql(
    counts: dict[str, int],
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> str:
    """DuckDB WHERE-clause twin of mix_sources' filter (same literal
    rates, same hash) — lets tests pin the exact survivor set across
    engines."""
    rates = mixture_rates(counts, weights)
    h = f"({P.token_hash32(f'CAST({id_col} AS VARCHAR)', P.DUCK)} % {_M})"
    branches = [
        f"({source_col} = {_sql_str(s)} AND {h} < {int(rate * _M)})"
        for s, rate in rates.items()
    ]
    return " OR ".join(branches)


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Per-source acceptance rates for TEMPERATURE-scaled mixing
    (multilingual-pretraining convention, e.g. XLM-R: sample source s
    ∝ n_s^α, α < 1 flattening the distribution toward rare sources):

        w_s    = n_s^α           (dyadic α via exact sqrt chains)
        cap    = min_t n_t / w_t (the binding source: the SMALLEST,
                                  which keeps rate 1.0 — temperature
                                  mixing never up-samples here, it
                                  down-samples the big sources toward
                                  the flattened shares)
        rate_s = w_s · cap / n_s

    Deliberately NOT normalized: the total Σw cancels algebraically,
    and skipping it removes the only order-sensitive float sum — every
    remaining op (sqrt, ÷, min, ×) is IEEE correctly rounded and
    order-free, so Python, Spark, and DuckDB derive bit-identical
    rates from the same counts (the q61 temp oracle re-runs this exact
    sequence in SQL).

    Binding sources get rate EXACTLY 1.0 by a float-equality test
    against the min (n/w == cap), not by trusting (w·cap)/n to round
    back to 1 — for non-perfect-square counts it lands one ulp below,
    and floor(rate·2^32) = 2^32−1 would then drop the one-in-4-billion
    row whose hash is exactly 2^32−1. Ties all clamp (the min is one
    of the compared values, so equality is exact)."""
    if not counts:
        raise ValueError("counts must be a non-empty {source: n} dict")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("source counts must be positive")
    w = {s: P.dyadic_pow_py(float(n), alpha) for s, n in counts.items()}
    nw = {s: float(counts[s]) / w[s] for s in counts}
    cap = min(nw.values())
    return {
        s: 1.0 if nw[s] == cap else (w[s] * cap) / float(counts[s])
        for s in counts
    }


def mix_sources_temperature(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows surviving temperature-scaled mixing over ALL (non-NULL)
    sources — same one-tiny-count-job-then-literal-map-side-filter
    shape as ``mix_sources``, with the target shares derived from the
    corpus itself (n_s^α) instead of prescribed weights."""
    rates = temperature_rates(_source_counts(docs, source_col), alpha)
    return _filter_by_rates(docs, rates, source_col, id_col)


def budget_quotas(
    counts: dict[str, int],
    budget: float,
    alpha: float = 1.0,
) -> dict[str, float]:
    """Water-filling allocation of an ABSOLUTE budget over sources —
    the form a pretraining run actually targets ("1T tokens, sources
    weighted n^α"), where temperature_rates only reshapes SHARES.

    Target shares ∝ n_s^α (dyadic α via exact sqrt chains); a source
    whose share-implied quota exceeds what it has is PINNED at n_s and
    its residual budget redistributes over the rest by their weights —
    iterated to the fixpoint (≤ |sources| rounds; each round pins ≥ 1
    source or terminates). All arithmetic is driver-side pure Python
    over the (bounded, source-cardinality) counts dict, iterating
    sources in SORTED order, so the quotas are deterministic literals
    — the q61 convention (Python-computed rates spliced exactly).

    Returns {source: quota} with sum(quotas) == min(budget, Σn) up to
    float rounding; quotas never exceed their source's count.
    """
    if not counts:
        raise ValueError("counts must be a non-empty {source: n} dict")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("source counts must be positive")
    if budget <= 0:
        raise ValueError("budget must be positive")
    total = sum(counts[s] for s in sorted(counts))
    if budget >= total:
        return {s: float(n) for s, n in counts.items()}
    w = {s: P.dyadic_pow_py(float(n), alpha) for s, n in counts.items()}
    quotas: dict[str, float] = {}
    remaining = float(budget)
    free = sorted(counts)
    while free:
        sumw = sum(w[s] for s in free)
        over = [
            s for s in free if w[s] * remaining / sumw >= counts[s]
        ]
        if not over:
            for s in free:
                quotas[s] = w[s] * remaining / sumw
            break
        for s in over:
            quotas[s] = float(counts[s])
            remaining -= counts[s]
            free.remove(s)
    return quotas


def mix_sources_budget(
    docs: DataFrame,
    budget: float,
    alpha: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_expr: str | None = None,
    counts: dict[str, float] | None = None,
) -> DataFrame:
    """Down-sample to an absolute budget with temperature-shaped
    per-source quotas (``budget_quotas``): one S-row count job derives
    the quotas, then survival is the same pure map-side hash-threshold
    filter every mixer here uses — expected survivors ≈ quota per
    source, pinned sources (rate 1.0) keep every row exactly. At
    100 TB the scan carries literal predicates; no join, no shuffle,
    no rand().

    ``weight_expr``: a SQL expression giving each row's budget weight
    (e.g. a token count — ``size(split(text, ' +'))``), making
    ``budget`` a TOKEN budget instead of a row budget: per-source
    masses are the weight SUMS, quotas water-fill in the same units,
    and the acceptance rate quota/mass makes the EXPECTED surviving
    mass hit the quota (the hash is content-independent of the
    weight, so sampled mass concentrates around rate × mass). Default
    ``None`` keeps row counting.

    ``counts``: precomputed per-source masses — callers that already
    ran the count job (e.g. to derive ``budget`` as a fraction of the
    total mass) pass it through and skip the recount."""
    if counts is None:
        if weight_expr is None:
            counts = _source_counts(docs, source_col)
        else:
            counts = {
                r[source_col]: r["n"]
                for r in docs.filter(F.col(source_col).isNotNull())
                .groupBy(source_col)
                .agg(F.sum(F.expr(weight_expr)).alias("n"))
                .collect()
            }
    quotas = budget_quotas(counts, budget, alpha)
    rates = {
        s: 1.0 if quotas[s] >= counts[s] else quotas[s] / counts[s]
        for s in counts
    }
    return _filter_by_rates(docs, rates, source_col, id_col)


# --- DSIR-style domain-relevance selection (round 11) ----------------------

DSIR_BUCKETS = 64
DSIR_SALT = ":dsir"


def domain_relevance_scores(
    docs: DataFrame,
    target_source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    buckets: int = DSIR_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Hashed-n-gram importance scoring in the DSIR shape (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score each pool document by how target-domain-like
    its token distribution is, using per-feature likelihood ratios
    between the TARGET source's hashed-unigram distribution and the
    POOL's. Returns ``(weights, scores)``:

        weights: (bucket, w)            — the trained model, one row
                                          per pool-occupied bucket
        scores:  (doc_id, source, score) — one row per pool document

    Faithfulness vs exactness: DSIR's per-feature weight is
    log p_target(b) − log p_pool(b); real logs are libm-bound, so the
    weight here is the FLOORED BASE-2 log of Laplace-smoothed counts —
    w[b] = ilog2(cnt_tgt[b]+1) − ilog2(cnt_pool[b]+1) — an integer
    log-likelihood ratio quantized to whole bits (the same
    integer-weight discipline as quality_clf's floored-Laplace
    classifier). A document's score is the SUM of its tokens' integer
    weights: order-free exact integer arithmetic, so the score is
    partition-invariant and a DuckDB twin reproduces it without any
    fold-order pinning. (The constant log-ratio of the two corpus
    totals shifts every score equally and is dropped — ranking, and
    therefore selection, is unaffected.)

    Scale shape: ONE tokenize pass feeds both count jobs and the
    scoring join (the bucketed token frame is persisted); the weight
    table is ≤ ``buckets`` rows and BROADCASTS into the scoring join,
    so the corpus-sized stream crosses one exchange (the per-doc sum).
    NULL-source documents are outside both the target and the pool.
    """
    from .cache import persist_tracked

    bkt = (
        F.expr(
            P.token_hash32(f"CONCAT({text_col}0, '{DSIR_SALT}')", P.SPARK)
        )
        % buckets
    )
    toks = persist_tracked(
        docs.filter(F.col(source_col).isNotNull())
        .select(
            id_col,
            source_col,
            F.explode(
                F.expr(P.split_ws(text_col, P.SPARK))
            ).alias(f"{text_col}0"),
        )
        .select(id_col, source_col, bkt.alias("bucket"))
    )
    tgt = toks.filter(F.col(source_col) == target_source)
    pool = toks.filter(F.col(source_col) != target_source)
    tc = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    pc = pool.groupBy("bucket").agg(F.count(F.lit(1)).alias("cp"))
    weights = (
        pc.join(tc, "bucket", "left")
        .select(
            "bucket",
            (
                F.expr(
                    P.ilog2("(COALESCE(ct, 0) + 1)", P.SPARK)
                )
                - F.expr(P.ilog2("(cp + 1)", P.SPARK))
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    scores = (
        pool.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.min(source_col).alias(source_col),
            F.sum("w").cast("bigint").alias("score"),
        )
    )
    return weights, scores


def domain_relevance_select(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k pool documents by (score DESC, id ASC) with a dense
    1-based rank — the deterministic stand-in for DSIR's Gumbel
    resampling draw. Two-phase at scale: ``orderBy().limit(k)``
    compiles to a distributed TakeOrderedAndProject; the row_number
    window then runs over only k rows."""
    from pyspark.sql import Window as W

    order = [F.col("score").desc(), F.col(id_col).asc()]
    top = scores.orderBy(*order).limit(k)
    return top.withColumn("rk", F.row_number().over(W.orderBy(*order)))
