"""Byte-pair-encoding tokenization — train on a sample, apply at scale.

The declared token-count query (q50) uses a whitespace + BPE-ish regex
approximation; this module is the REAL algorithm (Sennrich et al.
2016): learn a merge table from pair frequencies, then greedily apply
merges lowest-rank-first. The split matches production practice
(HuggingFace/SentencePiece trainers):

* **Training is sample-bound, driver-side.** Merge learning is an
  inherently sequential global argmax — each merge changes the pair
  counts the next iteration sees — so production tokenizers train on a
  bounded corpus SAMPLE, not the full 100 TB. ``train_bpe_merges``
  takes that sample as a DataFrame, uses ``stratified_sample``-style
  deterministic capping if the caller wants one, and runs the classic
  loop in Python on collected word counts (the collect is the
  documented sample, not the corpus).
* **Encoding is embarrassingly parallel.** ``bpe_encode`` ships the
  merge ranks to every task inside a ``mapInPandas`` closure (the
  merge table is ~num_merges rows — broadcast-sized), encodes each
  Arrow batch with a per-batch WORD CACHE (natural text repeats words
  heavily, so each distinct word is encoded once per batch), and never
  shuffles: token arrays are a scan-shaped projection, exactly like
  chunking.

Determinism: ties in the training argmax break on the
lexicographically smallest pair; encoding applies the lowest-rank
mergeable pair, leftmost first — both orders are total, so the merge
table and every encoding are reproducible across runs, partitionings,
and engines.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

END_OF_WORD = "</w>"


def _word_counts(
    sample: DataFrame, text_col: str, max_vocab: int | None
) -> Counter:
    from pyspark.sql import Window as W

    agg = (
        sample.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if max_vocab is not None:
        # top-N by (count desc, word asc) — the same two-phase top-k
        # shape as knn._two_phase_topk, so no single task ever sorts
        # the full distinct-word table; the global phase ranks
        # ≤ partitions·N survivors
        pre = W.partitionBy("__pid").orderBy(F.desc("c"), F.asc("w"))
        fin = W.partitionBy(F.lit(1)).orderBy(F.desc("c"), F.asc("w"))
        agg = (
            agg.withColumn("__pid", F.spark_partition_id())
            .withColumn("__r", F.row_number().over(pre))
            .filter(F.col("__r") <= max_vocab)
            .drop("__pid", "__r")
            .withColumn("__r", F.row_number().over(fin))
            .filter(F.col("__r") <= max_vocab)
            .drop("__r")
        )
    return Counter({r["w"]: r["c"] for r in agg.collect()})


def train_bpe_merges(
    sample: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_vocab: int | None = 65536,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from the sample's word counts.

    The word histogram aggregates DISTRIBUTED (one groupBy over the
    sample — only distinct words and counts are collected, not text);
    the merge loop itself is the sequential classic algorithm. Ties on
    pair frequency break lexicographically, so the table is unique.

    ``max_vocab`` bounds the driver collect BY CONSTRUCTION: only the
    top ``max_vocab`` distinct words by (count desc, word asc) are
    collected — on a carelessly-passed full corpus the unbounded
    distinct-word set (URLs, typos) would be driver-fatal, and the
    frequency tail it drops is exactly what BPE training ignores
    anyway (singleton words contribute pair counts a 200-merge table
    never reaches). Corpora with ≤ ``max_vocab`` distinct words train
    bit-identically to the unbounded path (``None`` restores it)."""
    counts = _word_counts(sample, text_col, max_vocab)
    return train_bpe_merges_from_counts(counts, num_merges)


def train_bpe_merges_from_counts(
    counts: dict, num_merges: int = 200
) -> list[tuple[str, str]]:
    """The sequential merge-learning loop over an in-hand word
    histogram — factored out of ``train_bpe_merges`` so a FIXED
    reference histogram can train a deterministic shipped vocabulary
    with no session at all (the production convention: tokenizers are
    trained once and shipped; encode is what runs at scale — the q50
    ``bpe`` oracle branch depends on the merge table being a pure
    compile-time constant both engines splice)."""
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (END_OF_WORD,): c for w, c in counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # highest count, smallest pair on ties — a total order, so the
        # learned table is unique
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the LOWEST-RANK adjacent pair
    (leftmost on rank ties) until none is mergeable."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — distributed greedy BPE.

    The merge table travels in the task closure (broadcast-sized); a
    per-batch word cache collapses the per-word merge loop to one run
    per DISTINCT word per Arrow batch. Map-side only — composes with
    chunking/packing exactly where the regex token counter did, with
    real subword counts.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in text.split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int32"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)
