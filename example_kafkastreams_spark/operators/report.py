"""Per-source corpus report — the "data card" a training-data release
ships (composition of the shipped profiling operators into one table).

One row per source: volume (docs, tokens), quality (mean composite
score, the q48 expression), language purity (share of docs whose
PREDICTED language — the operator's lang-ID, not the label column —
matches the expected language), duplication (1 − distinct-texts/docs,
the exact-dedup rate at source grain), and inequality of document
length (``udafs.gini_udaf`` — how concentrated the token budget is in
a few long documents).

Scale shape: every per-doc metric is a pure column expression fused
into the scan; the single aggregation groups by source, with
``count_distinct(md5(text))`` carrying 32-hex digests (never text)
through its distinct path and the Gini UDAF being the one full-group
Arrow aggregation (documented cost in functions/udafs.py — per-source
groups are the small grain this report runs at).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P
from ..registry import davg


def corpus_report(
    docs: DataFrame,
    expected_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, distinct_texts, dup_rate,
    mean_quality, pct_lang_pure, gini_chars) — one row per source."""
    # lazy: udafs defines a pandas_udf at import (needs an active
    # session), and queries_llm imports THIS module at decorator time
    # for profile_columns_sql — module-level imports here would make
    # that circular/sessionless (the operators/__init__ gotcha)
    from ..functions.udafs import gini_udaf
    from ..queries_llm import _quality_exprs

    exprs = _quality_exprs(P.SPARK)
    scores = P.lang_scores(text_col, P.SPARK)
    # scores materialize in their own projection first: lang_predict's
    # CASE chain references each score O(L) times, and only a named
    # column keeps the regex counts evaluated once per doc (the q48
    # pattern)
    scored = docs.select(
        F.col(source_col),
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__digest"),
        F.expr(exprs["n_tokens"]).alias("__n_tok"),
        F.expr(exprs["quality_score"]).alias("__q"),
        *[
            F.expr(e).alias(f"__s_{lang}")
            for lang, e in scores.items()
        ],
    )
    profiled = scored.withColumn(
        "__pred",
        F.expr(
            P.lang_predict({l: f"__s_{l}" for l in P.LANG_MARKERS})
        ),
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT): the Gini
    # column aggregates separately over a slim (source, chars)
    # projection and joins back at source grain (a handful of rows)
    gini = docs.select(
        F.col(source_col), F.length(F.col(text_col)).alias("__n_chars")
    ).groupBy(source_col).agg(
        F.round(gini_udaf("__n_chars"), 6).alias("gini_chars")
    )
    return (
        profiled.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tok").alias("n_tokens"),
            F.count_distinct("__digest").alias("distinct_texts"),
            # scaled-long mean (registry.davg): per-row round-to-6
            # then exact integer sum, so the mean is order-independent
            # and cross-engine bit-exact (the q11 discipline) — a
            # float avg would drift with partial-agg order
            F.round(davg(F.col("__q"), 6), 6).alias("mean_quality"),
            F.round(
                F.avg((F.col("__pred") == expected_lang).cast("double")),
                6,
            ).alias("pct_lang_pure"),
        )
        .join(gini, source_col)
        .withColumn(
            "dup_rate",
            F.round(
                1.0 - F.col("distinct_texts") / F.col("n_docs"), 6
            ),
        )
        .select(
            source_col, "n_docs", "n_tokens", "distinct_texts",
            "dup_rate", "mean_quality", "pct_lang_pure", "gini_chars",
        )
    )


def dup_ngram_stats(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-document n-gram redundancy per source — the corpus-health
    number behind the ExactSubstr/Gopher dedup decisions: what share
    of a source's distinct n-grams appear in MORE THAN ONE document
    (boilerplate, templates, syndicated text), and how much of the
    posting mass they carry.

    (source, n_docs, distinct_grams, dup_grams, postings) — all exact
    integers: distinct_grams = |{g : g in some doc}| within the
    source, dup_grams = |{g : g in ≥ 2 docs}| (per-doc multiplicity
    ignored — ``shingles`` is distinct-per-doc), postings = Σ_docs
    |distinct grams of doc|. The dup RATE is dup_grams/distinct_grams
    downstream; shipping integers keeps the row engine-exact.

    Scale shape (100 TB): the only shuffle carries (source, gram-hash)
    pairs — grams are md5-folded to BIGINT map-side (token_hash32), so
    no text crosses an exchange; the per-gram count aggregates with a
    map-side partial, and the final reduce is gram-grain → source
    grain. Docs shorter than ``n`` tokens contribute no postings but
    still count in n_docs (the left join keeps gramless sources)."""
    gram_hashes = P.transform_(
        P.shingles(text_col, n, P.SPARK), "g",
        P.token_hash32("g", P.SPARK), P.SPARK,
    )
    posts = docs.select(
        F.col(source_col), F.explode(F.expr(gram_hashes)).alias("__gh")
    )
    per_gram = posts.groupBy(source_col, "__gh").agg(
        F.count(F.lit(1)).alias("__c")
    )
    stats = per_gram.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum((F.col("__c") >= 2).cast("long")).alias("dup_grams"),
        F.sum("__c").alias("postings"),
    )
    ndocs = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    return ndocs.join(stats, source_col, "left").select(
        source_col,
        "n_docs",
        F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
        F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
        F.coalesce("postings", F.lit(0)).alias("postings"),
    )


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Exact-duplicate contamination BETWEEN sources: for every source
    pair, how many distinct text digests appear in both — the
    cross-source leg of the data card (a mirror site or re-crawl shows
    up as a near-total overlap row; eval-set contamination of a
    training source as a nonzero row against the benchmark source).

    (source_a, source_b, n_shared): one row per unordered pair with
    source_a < source_b and n_shared ≥ 1, plus the diagonal
    (s, s, distinct digests of s) so overlap fractions
    n_shared/min(|a|, |b|) are computable from the table alone.

    Scale shape (100 TB): reduces to DISTINCT (digest, source) FIRST —
    the shuffle carries 32-hex digests, never text — then self-joins
    on digest; per-digest fan-out is bounded by the number of sources
    carrying it (≤ S, so ≤ S² pair rows per digest, with S = #sources
    a handful even at petabyte scale)."""
    ds = docs.select(
        F.md5(F.col(text_col)).alias("__digest"), F.col(source_col)
    ).distinct()
    a = ds.select("__digest", F.col(source_col).alias("source_a"))
    b = ds.select("__digest", F.col(source_col).alias("source_b"))
    pairs = (
        a.join(b, "__digest")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    diag = ds.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_shared")
    ).select(
        F.col(source_col).alias("source_a"),
        F.col(source_col).alias("source_b"),
        "n_shared",
    )
    return pairs.unionByName(diag)


def split_leakage_report(
    sized_components: DataFrame,
    docs_with_split: DataFrame,
    node_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Near-duplicate clusters that SPAN train/val/test splits — the
    leakage a content-hash split cannot prevent.

    ``sampling.assign_split`` hashes the full text, so byte-identical
    duplicates land in the same split BY CONSTRUCTION; what still
    leaks evaluation signal into training is the *near*-duplicate: two
    slightly-different copies hash to different splits while carrying
    the same content. This audit joins the near-dup connected
    components (``components.connected_components`` over the SimHash/
    MinHash edge graph) with the split assignment and reports every
    component whose members cross a split boundary:

        (component_id, component_size, n_splits, splits_csv)

    with ``splits_csv`` the sorted distinct split names (deterministic
    across engines/partitionings).

    Cluster members MISSING from ``docs_with_split`` surface as the
    sentinel split ``__unassigned__`` (a left join) rather than
    silently shrinking the cluster's observed splits — an inner join
    would let a coverage gap mask a real leak while component_size
    still claimed the full cluster.

    Scale shape (100 TB): the audit rides the dedup pass — components
    and the split column are both already-computed scan-fused inputs.
    Singleton components (the overwhelming mass of a deduplicated
    corpus) are filtered BEFORE the join, so the one hash aggregation
    groups only the duplicate mass by component_id; nothing rescans or
    reshuffles the corpus text.
    """
    spanning = (
        sized_components.filter(F.col("component_size") > 1)
        .join(
            docs_with_split.select(node_col, split_col),
            node_col,
            "left",
        )
        .withColumn(
            split_col,
            F.coalesce(F.col(split_col), F.lit("__unassigned__")),
        )
        .groupBy("component_id")
        .agg(
            F.max("component_size").alias("component_size"),
            F.count_distinct(split_col).alias("n_splits"),
            F.array_join(
                F.array_sort(F.collect_set(split_col)), ","
            ).alias("splits_csv"),
        )
        .filter(F.col("n_splits") > 1)
    )
    return spanning.select(
        "component_id", "component_size", "n_splits", "splits_csv"
    )


def profile_columns(
    df: DataFrame,
    dtypes: dict[str, str] | None = None,
) -> DataFrame:
    """Per-COLUMN table profile — the ``ANALYZE TABLE``/data-quality
    audit a pipeline runs before trusting a new input drop: one row
    per column with nulls, exact distinct count, min/max, and (for
    strings) mean length.

    Output: (column_name, dtype, n_rows, n_null, n_distinct, min_num,
    max_num, min_str, max_str, avg_len) — numeric/timestamp extremes
    land in ``min_num``/``max_num`` as doubles (bigints < 2^53 and
    epoch-millis convert exactly; timestamps profile as epoch ms so no
    engine-specific rendering enters a checked row), string extremes
    in ``min_str``/``max_str`` (bytewise comparisons agree across
    engines on this corpus's ASCII), the other pair NULL.

    Scale shape: ONE aggregation job over one scan — all per-column
    statistics are conditional aggregates of the same pass. The exact
    ``count_distinct`` per column is the oracle-checkable form; Spark
    plans multi-distinct via Expand (cost ≈ |cols| × rows in the
    exchange), and at 100 TB the drop-in replacement is the grouped
    HLL sketch (``sketches.hll_registers_grouped``) at ~KB of state
    per column — same output contract, estimate instead of exact.
    ``avg_len`` = sum(length)/count: one IEEE division of exact
    integer counts. Rows emerge via one ``stack`` over the single
    aggregate row — no second scan.
    """
    dtypes = dtypes or {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # The exact distincts aggregate in their OWN pass, cross-joined to
    # the plain-aggregate row: Spark plans mixed distinct+non-distinct
    # aggregates through one Expand that multiplies the scan by
    # (1 + n_distinct_cols) and drags every plain aggregate through
    # the expanded stream — measured 3.9 s vs 0.7 + 1.4 s for the two
    # single-shape passes over the same table (sf0.1 orders). Two
    # column-pruned scans beat one Expand-amplified scan at any scale;
    # the aggregate VALUES are identical.
    nd_aggs = [
        F.count_distinct(F.col(c)).alias(f"__nd_{c}") for c in dtypes
    ]
    aggs = []
    for c, t in dtypes.items():
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
        if t in ("string",):
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            aggs.append(
                F.sum(F.length(c).cast("long")).alias(f"__len_{c}")
            )
        elif t == "timestamp":
            em = F.unix_millis(F.col(c))
            aggs.append(F.min(em).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(em).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    row = df.agg(F.count(F.lit(1)).alias("__rows"), *aggs).crossJoin(
        F.broadcast(df.agg(*nd_aggs))
    )
    arms = []
    for c, t in dtypes.items():
        is_str = t == "string"
        min_num = "CAST(NULL AS DOUBLE)" if is_str else f"__min_{c}"
        max_num = "CAST(NULL AS DOUBLE)" if is_str else f"__max_{c}"
        min_str = f"__min_{c}" if is_str else "CAST(NULL AS STRING)"
        max_str = f"__max_{c}" if is_str else "CAST(NULL AS STRING)"
        avg_len = (
            f"CAST(__len_{c} AS DOUBLE) / __cnt_{c}"
            if is_str
            else "CAST(NULL AS DOUBLE)"
        )
        arms.append(
            f"named_struct('column_name', '{c}', 'dtype', '{t}',"
            f" 'n_rows', __rows, 'n_null', __rows - __cnt_{c},"
            f" 'n_distinct', __nd_{c},"
            f" 'min_num', CAST({min_num} AS DOUBLE),"
            f" 'max_num', CAST({max_num} AS DOUBLE),"
            f" 'min_str', CAST({min_str} AS STRING),"
            f" 'max_str', CAST({max_str} AS STRING),"
            f" 'avg_len', CAST({avg_len} AS DOUBLE))"
        )
    return row.selectExpr(
        f"explode(array({', '.join(arms)})) AS s"
    ).select("s.*")


def profile_columns_sql(
    table: str, dtypes: dict[str, str], d: str = P.DUCK
) -> str:
    """Dual-dialect twin of ``profile_columns`` — one UNION ALL arm
    per column (the oracle runs at sf0.01; the Spark side keeps the
    single-pass stack shape)."""
    arms = []
    for c, t in dtypes.items():
        is_str = t == "string"
        if t == "timestamp":
            mn = f"CAST(min(epoch_ms({c})) AS DOUBLE)"
            mx = f"CAST(max(epoch_ms({c})) AS DOUBLE)"
        elif is_str:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
        else:
            mn = f"CAST(min({c}) AS DOUBLE)"
            mx = f"CAST(max({c}) AS DOUBLE)"
        min_str = f"min({c})" if is_str else "CAST(NULL AS VARCHAR)"
        max_str = f"max({c})" if is_str else "CAST(NULL AS VARCHAR)"
        avg_len = (
            f"CAST(sum(length({c})) AS DOUBLE) / count({c})"
            if is_str
            else "CAST(NULL AS DOUBLE)"
        )
        arms.append(
            f"SELECT '{c}' AS column_name, '{t}' AS dtype,"
            f" count(*) AS n_rows,"
            f" count(*) - count({c}) AS n_null,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {min_str} AS min_str, {max_str} AS max_str,"
            f" {avg_len} AS avg_len"
            f" FROM {table}"
        )
    return " UNION ALL ".join(arms)
