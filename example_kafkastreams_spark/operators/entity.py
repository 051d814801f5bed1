"""Entity resolution — blocking + multi-attribute record linkage on
relational tables.

The record-linkage twin of the document near-dup family: find rows
that DESCRIBE THE SAME ENTITY under different keys (duplicate
suppliers, re-listed parts, merged customer accounts). All-pairs
comparison is quadratic; the standard fix (Fellegi–Sunter linkage
behind token blocking, Papadakis et al.'s blocking surveys) is:

1. **Block**: each record emits ONE key — its globally RAREST name
   token (lowest document frequency, ties to the lexicographically
   smallest). Rare tokens are the discriminative ones, so co-referent
   records (which share their name tokens, hence their rarest token)
   land in the same block, while blocks stay small: a block's size is
   bounded by its token's df, and records whose every token is
   boilerplate fall into oversized blocks that ``max_block`` drops
   outright (the df-cap/stop-token discipline
   ``neardup.containment_pairs`` uses).
2. **Compare within blocks**: weighted multi-attribute score —
   Jaccard over distinct name tokens plus exact-match indicators on
   categorical attributes (brand, type, ...). Candidates are
   Σ_blocks size², never |table|².

Spark shape: token df is a vocabulary-sized aggregate; the df table
broadcasts back onto the exploded tokens and ``min_by`` collapses to
one (record, block) row map-side before a record-keyed exchange; the
self-join shuffles on the block key only (ids + tokens, never full
rows — attributes join back id-sized for scoring). Every stage's
exchange is bounded by records or vocabulary, not pairs.

Cross-engine determinism: token split/distinct are the portable
expressions, the rarest pick ties to (df, token) in both engines, and
the score is a fixed chain of exact small-integer ratios and 0/1
indicators scaled by decimal literals — the q59 ``er`` branch
hash-checks matches AND scores against DuckDB re-deriving the whole
funnel.

Blocking recall caveat (documented, standard): a pair is guaranteed a
shared block only when the two records agree on their rarest token —
true for same-name pairs by construction. Cross-name matches need
multi-key blocking (emit top-j rarest tokens; same join, j× keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P

__all__ = ["token_df", "rarest_token_blocks", "blocked_er_matches"]


def _toks(text_col: str) -> str:
    # split('', ' ') yields [''] in both engines — without the blank
    # filter every empty-name record would share one accidental block
    # (quadratic noise at scale) and jaccard({''},{''}) would read 1
    return P.filter_(
        P.distinct_(P.split_ws(text_col, P.SPARK), P.SPARK),
        "t",
        "t <> ''",
        P.SPARK,
    )


def token_df(
    records: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(tok, df) — document frequency of each distinct token of
    ``text_col``. Vocabulary-sized output."""
    return (
        records.select(F.explode(F.expr(_toks(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def ranked_name_tokens(
    records: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, tok, df) — every record's name tokens joined to their
    global document frequency: the blocking input both num_keys
    regimes rank over. Factored out so a caller running SEVERAL
    blocking variants over the same records (q59's er/er2) can
    persist ONE tokenize+df pass and share it; max_block pruning
    stays per-variant because block sizes depend on num_keys."""
    dfs = token_df(records, id_col, text_col)
    return (
        records.select(
            F.col(id_col), F.explode(F.expr(_toks(text_col))).alias("tok")
        )
        .join(F.broadcast(dfs), "tok")
    )


def rarest_token_blocks(
    records: DataFrame,
    id_col: str,
    text_col: str,
    max_block: int | None = None,
    num_keys: int = 1,
    ranked_df: DataFrame | None = None,
) -> DataFrame:
    """(id, block) — each record keyed by its ``num_keys`` rarest name
    tokens (ties to the smaller token). One key is the cheap default;
    multi-key blocking is the standard recall extension: a pair is a
    candidate if ANY of their rare tokens coincide, so cross-name
    matches that disagree on the single rarest token still meet (at
    num_keys× the block rows — same join, candidate growth bounded by
    the same per-block cap). With ``max_block``, blocks holding more
    than that many records are dropped entirely: their token is
    boilerplate and their candidates quadratic noise."""
    if num_keys < 1:
        raise ValueError("num_keys must be >= 1")
    ranked = (
        ranked_df
        if ranked_df is not None
        else ranked_name_tokens(records, id_col, text_col)
    )
    if num_keys == 1:
        blocks = ranked.groupBy(id_col).agg(
            F.min_by(
                F.col("tok"), F.struct(F.col("df"), F.col("tok"))
            ).alias("block")
        )
    else:
        from pyspark.sql import Window as W

        w = W.partitionBy(id_col).orderBy(F.col("df"), F.col("tok"))
        blocks = (
            ranked.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= num_keys)
            .select(F.col(id_col), F.col("tok").alias("block"))
        )
    if max_block is not None:
        sizes = blocks.groupBy("block").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        blocks = (
            blocks.join(F.broadcast(sizes), "block")
            .filter(F.col("__bn") <= max_block)
            .drop("__bn")
        )
    return blocks


def blocked_er_matches(
    records: DataFrame,
    id_col: str,
    name_col: str,
    exact_cols: dict[str, float],
    name_weight: float = 0.5,
    threshold: float = 0.7,
    max_block: int | None = None,
    num_keys: int = 1,
    contract_exact: bool = False,
    ranked_df: DataFrame | None = None,
) -> DataFrame:
    """Matched pairs (id_a < id_b) with their linkage score:

        score = name_weight · jaccard(name tokens)
              + Σ weight_c · [record_a.c == record_b.c]

    kept when score >= threshold. ``exact_cols`` maps each categorical
    attribute to its weight. The Jaccard is over DISTINCT tokens —
    small exact integer counts, one IEEE division — and each indicator
    is 0/1 scaled by a decimal literal, so scores are bit-reproducible
    cross-engine.

    ``contract_exact``: collapse records with IDENTICAL (name, attrs)
    to one min-id representative BEFORE blocking — the dedup family's
    star-contraction move. An N-way-duplicated catalog otherwise costs
    N² comparisons per entity inside every block; exact twins are the
    same entity by definition, so matching reps loses nothing. Output
    pairs are then REP pairs (group membership recovers the rest)."""
    cols = [F.col(id_col), F.expr(_toks(name_col)).alias("__toks")] + [
        F.col(c) for c in exact_cols
    ]
    if contract_exact:
        if ranked_df is not None:
            raise ValueError(
                "ranked_df must be built from the CONTRACTED records; "
                "pass one or the other"
            )
        records = records.groupBy(name_col, *exact_cols).agg(
            F.min(id_col).alias(id_col)
        )
    attrs = records.select(*cols)
    blocks = rarest_token_blocks(
        records, id_col, name_col, max_block, num_keys,
        ranked_df=ranked_df,
    )
    # candidate ID pairs first, DISTINCT before scoring: multi-key
    # blocking surfaces the same pair through several blocks
    ba = blocks.select(F.col("block"), F.col(id_col).alias("id_a"))
    bb = blocks.select(F.col("block"), F.col(id_col).alias("id_b"))
    cand = (
        ba.join(bb, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = attrs.select(
        F.col(id_col).alias("id_a"),
        F.col("__toks").alias("__ta"),
        *[F.col(c).alias(f"__a_{c}") for c in exact_cols],
    )
    b = attrs.select(
        F.col(id_col).alias("id_b"),
        F.col("__toks").alias("__tb"),
        *[F.col(c).alias(f"__b_{c}") for c in exact_cols],
    )
    jac = (
        F.expr(
            f"CAST({P.size_(P.intersect_('__ta', '__tb', P.SPARK), P.SPARK)}"
            " AS DOUBLE)"
        )
        / F.expr(
            f"CAST({P.union_size('__ta', '__tb', P.SPARK)} AS DOUBLE)"
        )
    )
    score = F.lit(float(name_weight)) * jac
    for c, w in exact_cols.items():
        score = score + F.lit(float(w)) * F.when(
            F.col(f"__a_{c}") == F.col(f"__b_{c}"), F.lit(1.0)
        ).otherwise(F.lit(0.0))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("score", score)
        .filter(
            F.expr(P.round_dbl("score", 6, P.SPARK))
            >= F.lit(float(threshold))
        )
        .select(
            "id_a",
            "id_b",
            F.expr(P.round_dbl("score", 6, P.SPARK)).alias("score"),
        )
    )


def er_survivorship(
    matches: DataFrame,
    records: DataFrame,
    id_col: str,
    attr_col: str,
) -> DataFrame:
    """Golden-record construction — the step AFTER matching that makes
    entity resolution useful: close the match pairs transitively into
    entity clusters, elect a canonical (golden) id per cluster, and
    fuse one attribute by majority vote. One row per MATCHED record:

        (member, golden, attr, attr_share)

    ``golden`` is the cluster's min id (the same canonical-survivor
    rule the dedup components use), ``attr`` the cluster's
    most-frequent value of ``attr_col`` with deterministic ties
    (count DESC, value ASC), ``attr_share`` the exact fraction of
    members carrying it (one IEEE division of exact integers — a
    confidence the consumer can threshold on).

    Scale shape: everything downstream of the match set is
    match-sized, not corpus-sized — components run on the pair graph
    (operators.components' Pregel loop), attribute votes are one hash
    agg over members, and the per-cluster election is a window over
    (cluster, attr) rows. Unmatched records are their own golden
    record by definition and are not re-emitted.

    Reference scope: extends the reference's enrichment join family
    (KTable lookup) to the fused-dimension build a warehouse runs
    after record linkage; no reference twin exists.
    """
    from .components import connected_components

    edges = matches.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    nodes = (
        edges.select(F.col("doc_a").alias(id_col))
        .unionAll(edges.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # the pair graph is match-sized (≪ the record table) — broadcast
    # the per-round label table explicitly and skip the auto-sizing job
    comp = connected_components(
        edges, nodes=nodes, node_col=id_col, broadcast=True
    )
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    votes = (
        comp.join(records.select(id_col, attr_col), id_col)
        .groupBy("component_id", attr_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    from pyspark.sql import Window as W

    elected = (
        votes.withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("component_id").orderBy(
                    F.col("__c").desc(), F.col(attr_col).asc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("component_id", attr_col, "__c")
    )
    return (
        comp.join(elected, "component_id")
        .join(sizes, "component_id")
        .select(
            F.col(id_col).alias("member"),
            F.col("component_id").alias("golden"),
            F.col(attr_col).alias("attr"),
            (
                F.col("__c").cast("double") / F.col("__n").cast("double")
            ).alias("attr_share"),
        )
    )
