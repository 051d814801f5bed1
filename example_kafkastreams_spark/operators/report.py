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
from ..functions.udafs import gini_udaf
from ..queries_llm import _quality_exprs
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
