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
from pyspark.sql import DataFrame
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
) -> DataFrame:
    """(pack_id, n_chunks, n_tokens, text) — greedy first-fit packing.

    A chunk larger than ``budget`` ships alone in its own pack (the
    trainer's truncation policy owns it from there); every other pack
    holds the maximal greedy run of chunks with total tokens <= budget.
    Every input chunk lands in exactly one pack.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    ordered = chunks.sortWithinPartitions(id_col, order_col)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        cur_texts: list[str] = []
        cur_tokens = 0

        def flush() -> dict:
            nonlocal seq, cur_texts, cur_tokens
            row = {
                "pack_id": f"p{pid}-{seq}",
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
            for text, n_tok in zip(pdf[text_col], pdf[tokens_col]):
                n_tok = int(n_tok)
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
