"""Dedup-candidate evaluation — measured precision/recall of an LSH
blocking scheme against exact ground truth on a sample.

Near-dup pipelines tune (num_hashes, bands, threshold) by the LSH
S-curve, but the curve is an i.i.d. idealization — real corpora have
correlated shingles and skewed lengths, so production practice (e.g.
Lee et al. 2022's dedup ablations) is to MEASURE the blocking: on a
deterministic sample, compare the band-collision candidate set against
the exact-Jaccard truth set and report precision / recall / F1. A
recall drop after retuning bands is a silent-data-loss bug this
harness turns into a number — the retrieval twin is
``retrieval.retrieval_eval``.

Shape: everything is restricted to the ``id % sample_mod == 0`` sample
FIRST, so cost is sample-bounded by construction (the corpus never
joins). Truth generation is exact WITHOUT an all-pairs scan: a pair
with Jaccard > 0 shares ≥ 1 shingle, so truth candidates come from the
shingle-postings self-join (DISTINCT pairs sharing a posting —
worst-case sample², typically far less), then the exact
distinct-shingle Jaccard filters. Candidates are the same band
collisions ``minhash_lsh_pairs`` compares. Metrics are exact integer
counts with single IEEE divisions (zero-denominator guarded to 0.0 in
both engines) — bit-reproducible, hash-checked by q41's ``eval``
branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as P
from .neardup import lsh_bands, with_minhash

__all__ = ["candidate_eval"]


def candidate_eval(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    sample_mod: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Three rows — (metric, n, value):

    - ``('precision', |candidates|, hit/|candidates|)``
    - ``('recall',    |truth|,      hit/|truth|)``
    - ``('f1',        |hit|,        2·hit/(|truth|+|candidates|))``

    where truth = sample pairs with exact distinct-shingle Jaccard ≥
    ``threshold`` and candidates = the sample's band-collision pairs.
    """
    sample = docs.filter(F.col(id_col) % sample_mod == 0)
    sh_expr = P.distinct_(
        P.shingles(text_col, shingle_n, P.SPARK), P.SPARK
    )
    sdocs = sample.select(F.col(id_col), F.expr(sh_expr).alias("__sh"))
    post = sdocs.select(F.col(id_col), F.explode("__sh").alias("tok"))
    pa = post.select(F.col(id_col).alias("doc_a"), "tok")
    pb = post.hint("shuffle_hash").select(
        F.col(id_col).alias("doc_b"), "tok"
    )
    tcand = (
        pa.join(pb, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sdocs.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sa"))
    sb = sdocs.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sb"))
    jac = (
        f"CAST({P.size_(P.intersect_('__sa', '__sb', P.SPARK), P.SPARK)}"
        " AS DOUBLE)"
        f" / CAST({P.union_size('__sa', '__sb', P.SPARK)} AS DOUBLE)"
    )
    truth = (
        tcand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.expr(P.round_dbl(jac, 6, P.SPARK)) >= F.lit(float(threshold))
        )
        .select("doc_a", "doc_b")
    )

    sig = with_minhash(
        sample, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
    )
    bdf = lsh_bands(sig, id_col, bands, num_hashes // bands)
    ba = bdf.alias("ba")
    bb = bdf.hint("shuffle_hash").alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col(f"ba.{id_col}") < F.col(f"bb.{id_col}")),
        )
        .select(
            F.col(f"ba.{id_col}").alias("doc_a"),
            F.col(f"bb.{id_col}").alias("doc_b"),
        )
        .distinct()
    )

    agg = (
        truth.withColumn("__t", F.lit(1))
        .join(
            cand.withColumn("__c", F.lit(1)),
            ["doc_a", "doc_b"],
            "full_outer",
        )
        .agg(
            # outer coalesce: SUM over ZERO rows is NULL in both
            # engines — an empty eval must read 0, not NULL
            F.coalesce(
                F.sum(F.coalesce(F.col("__t"), F.lit(0))), F.lit(0)
            ).alias("n_truth"),
            F.coalesce(
                F.sum(F.coalesce(F.col("__c"), F.lit(0))), F.lit(0)
            ).alias("n_cand"),
            F.coalesce(
                F.sum(
                    F.coalesce(F.col("__t"), F.lit(0))
                    * F.coalesce(F.col("__c"), F.lit(0))
                ),
                F.lit(0),
            ).alias("n_hit"),
        )
    )

    def ratio(num, den):
        return F.when(den == 0, F.lit(0.0)).otherwise(
            num.cast("double") / den.cast("double")
        )

    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("precision").alias("metric"),
                    F.col("n_cand").alias("n"),
                    ratio(F.col("n_hit"), F.col("n_cand")).alias("value"),
                ),
                F.struct(
                    F.lit("recall").alias("metric"),
                    F.col("n_truth").alias("n"),
                    ratio(F.col("n_hit"), F.col("n_truth")).alias("value"),
                ),
                F.struct(
                    F.lit("f1").alias("metric"),
                    F.col("n_hit").alias("n"),
                    ratio(
                        F.lit(2) * F.col("n_hit"),
                        F.col("n_truth") + F.col("n_cand"),
                    ).alias("value"),
                ),
            )
        ).alias("m")
    ).select("m.metric", "m.n", "m.value")
