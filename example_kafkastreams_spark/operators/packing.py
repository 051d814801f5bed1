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
    group_docs: int | None = None,
) -> DataFrame:
    """(pack_id, n_chunks, n_tokens, text) — greedy first-fit packing.

    A chunk larger than ``budget`` ships alone in its own pack (the
    trainer's truncation policy owns it from there); every other pack
    holds the maximal greedy run of chunks with total tokens <= budget.
    Every input chunk lands in exactly one pack.

    Three modes (VERDICT r3 item 3 + r4 item 4):

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
      packing — negligible when documents span many packs, but
      MEASURED at 31 points of fill on the bench corpus (BENCH_r05
      ``packing_fill``), whose documents average UNDER one budget of
      tokens. Hence:
    * ``canonical=True, group_docs=G`` (the hybrid): the fold restarts
      per GROUP of documents — group key ``floor(id/G)`` — so up to G
      consecutive documents share packs (recovering nearly all of the
      greedy fill) while the output stays a pure deterministic fold of
      the group's (id, order)-sorted chunks: byte-identical under ANY
      input partitioning, ids namespaced ``g{group}-{seq}``. Requires
      an integral ``id_col`` (the group key is integer division).

    Scale shape, all modes: one hash exchange at most (on the doc or
    group key), then a single embarrassingly-parallel Arrow pass.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if group_docs is not None:
        if not canonical:
            raise ValueError("group_docs requires canonical=True")
        if group_docs < 1:
            raise ValueError(f"group_docs must be >= 1, got {group_docs}")

    if canonical:
        # Explicit partition count: without one, repartition inherits
        # spark.sql.shuffle.partitions — in a vanilla 200-partition
        # session that is 200 near-empty tasks over a small chunk table
        # (ADVICE r4). defaultParallelism = the slot count, the same
        # sizing _rebalance uses.
        n = chunks.sparkSession.sparkContext.defaultParallelism
        part_key = (
            F.col(id_col)
            if group_docs is None
            # all docs of a group land in one task; sorting by id also
            # sorts by group (floor(id/G) is monotonic in id)
            else F.floor(F.col(id_col) / F.lit(group_docs))
        )
        ordered = chunks.repartition(n, part_key).sortWithinPartitions(
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
        cur_bound = None  # canonical: the doc (or doc group) being packed

        def boundary(doc):
            return doc if group_docs is None else int(doc) // group_docs

        def flush() -> dict:
            nonlocal seq, cur_texts, cur_tokens
            if not canonical:
                prefix = f"p{pid}"
            elif group_docs is None:
                prefix = str(cur_bound)
            else:
                prefix = f"g{cur_bound}"
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
                if canonical and boundary(doc) != cur_bound:
                    if cur_texts:  # close the previous fold's pack
                        rows.append(flush())
                    cur_bound = boundary(doc)
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


ASSIGNMENT_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("pack_offset", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
    ]
)


def pack_assignments(
    chunks: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(pack_id, doc_id, chunk_idx, pack_offset, n_tokens) — WHERE each
    chunk lands, instead of the merged text ``pack_chunks`` emits: the
    membership table that lets document-grain annotations (loss masks,
    provenance, span labels) follow their tokens INTO the packed
    training sequences. ``pack_offset`` is the number of content
    tokens before this chunk within its pack, so the chunk's tokens
    occupy pack positions [pack_offset + 1, pack_offset + n_tokens]
    in the pack's CONTENT token stream (offsets count chunk tokens
    only; ``pack_chunks``' display separator is not a token).

    Always the CANONICAL per-document fold (the only oracle-checkable
    mode — pack ids ``{doc_id}-{seq}`` and assignments are a pure
    function of each doc's (order_col-sorted) chunk sizes, identical
    under any input partitioning); same greedy semantics as
    ``pack_chunks(canonical=True)``: a pack closes when the next chunk
    would exceed ``budget``, an oversized chunk ships alone.

    Scale shape: one group-bounded hash exchange on the doc id carrying
    only (id, order, tokens) — never the chunk text — then the greedy
    fold runs as a JVM ``aggregate`` over each doc's sorted size array
    (bounded by chunks-per-document, not corpus size). No Python
    boundary: the fold is exact integer arithmetic, so built-in
    higher-order functions replace the former Arrow pass outright
    (guide §4.1) — same rows, no worker init, no text serialization.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = F.lit(int(budget)).cast("long")
    grouped = chunks.groupBy(F.col(id_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).cast("int").alias("i"),
                    F.col(tokens_col).cast("long").alias("n"),
                )
            )
        ).alias("__cs")
    )
    init = F.struct(
        F.lit(0).alias("seq"),
        F.lit(0).cast("long").alias("cur"),
        F.array().cast(
            "array<struct<i:int,s:int,o:bigint,n:bigint>>"
        ).alias("out"),
    )

    def step(acc, x):
        # close the open pack when the chunk would overflow it
        closed = (acc["cur"] > F.lit(0).cast("long")) & (
            (acc["cur"] + x["n"]) > b
        )
        seq1 = F.when(closed, acc["seq"] + F.lit(1)).otherwise(acc["seq"])
        off = F.when(closed, F.lit(0).cast("long")).otherwise(acc["cur"])
        cur1 = off + x["n"]
        full = cur1 >= b  # full (or oversized singleton)
        return F.struct(
            F.when(full, seq1 + F.lit(1)).otherwise(seq1).alias("seq"),
            F.when(full, F.lit(0).cast("long")).otherwise(cur1).alias(
                "cur"
            ),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["i"].alias("i"),
                        seq1.alias("s"),
                        off.alias("o"),
                        x["n"].alias("n"),
                    )
                ),
            ).alias("out"),
        )

    folded = grouped.select(
        F.col(id_col),
        F.explode(
            F.aggregate(F.col("__cs"), init, step, lambda acc: acc["out"])
        ).alias("__a"),
    )
    return folded.select(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit("-"),
            F.col("__a.s").cast("string"),
        ).alias("pack_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col("__a.i").alias("chunk_idx"),
        F.col("__a.o").alias("pack_offset"),
        F.col("__a.n").alias("n_tokens"),
    )


def shard_assignment(
    df: DataFrame,
    num_shards: int,
    key_col: str = "pack_id",
) -> DataFrame:
    """The shard writers' placement columns, as ONE shared expression:

    * ``__shard``  — first 8 md5 hex digits of the row key, mod
      ``num_shards``: a pure function of the key, so assignment is
      identical across runs, sessions, engines, and cluster layouts.
    * ``__shard_ord`` — the full md5: a seedless reproducible
      permutation within the shard (any shard prefix is a uniform
      corpus sample).

    Factored out of ``write_training_shards`` /
    ``pipelines.training_shards_sink`` so the batch job, the stream,
    and the driver-checked query (q54's ``shard`` branch) provably
    compute the SAME placement — the q54 oracle re-derives this exact
    expression in DuckDB (hex digits folded left-to-right), so the
    contract is value-checked, not just shared by convention.
    """
    return df.withColumns(
        {
            "__shard_ord": F.md5(F.col(key_col).cast("string")),
            "__shard": F.expr(
                f"CAST(conv(substr(md5(CAST({key_col} AS STRING)), 1, 8),"
                f" 16, 10) AS BIGINT) % {num_shards}"
            ),
        }
    )


def write_training_shards(
    packs: DataFrame,
    path: str,
    num_shards: int,
    key_col: str = "pack_id",
) -> None:
    """The funnel's last mile: packed sequences → on-disk training
    shards with a DETERMINISTIC decorrelated order.

    Trainers want (a) a fixed shard count they can assign to data
    loaders, (b) sample order decorrelated from corpus order (adjacent
    packs come from adjacent documents — reading them in order would
    feed the model long runs of one source), and (c) reproducibility.
    The shard id is a PURE FUNCTION of the row key — the first 8 md5
    hex digits mod ``num_shards`` — written as a parquet partition
    directory (``__shard=k/``), so assignment is identical across
    runs, sessions, and cluster layouts by construction. (An earlier
    draft used ``repartitionByRange`` over the md5 order: its
    boundaries come from reservoir sampling seeded by the RDD id, so
    beyond toy scale the assignment silently changed between runs —
    exactly the contract violation this computes away.) Within a
    shard, rows sort by the full md5 — a seedless reproducible
    permutation, so any shard prefix is a uniform corpus sample.

    Scale shape: one exchange on the shard id moves each row to its
    writer; the within-shard sort is shard-sized by construction.
    """
    keyed = shard_assignment(packs, num_shards, key_col)
    (
        keyed.repartition(num_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", "__shard_ord")
        .drop("__shard_ord")
        .write.mode("overwrite")
        .partitionBy("__shard")
        .parquet(path)
    )


# --- length-bucketed batching ------------------------------------------------

def length_bucketed_batches(
    chunks: DataFrame,
    batch_size: int,
    bounds: tuple[int, ...],
    len_col: str = "n_tokens",
    key_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Assign training sequences to LENGTH-BUCKETED batches — the
    dynamic-batching move every trainer data loader makes: a batch
    pads to its longest member, so batching a 3-token sequence with a
    32-token one wastes 29 slots per row; grouping near-equal lengths
    first makes padding waste collapse.

    ``bounds`` are ascending bucket lower-edges (a sequence's bucket =
    #bounds ≤ its length — a static CASE ladder, map-side). Within a
    bucket, sequences order CANONICALLY by (length, *key_cols) — a
    pure function of the data, so batch membership and order are
    partition/run-independent (the canonical-packing discipline, which
    also makes the assignment cross-engine checkable) — and batch
    ``(rn−1) div batch_size`` follows. Returns the input plus
    (bucket, batch_idx, batch_ord).

    Scale shape: one exchange on the bucket key (the row_number
    window); everything else is map-side. At 100 TB you'd range-bucket
    the window by (bucket, length prefix) — same result by
    canonicality.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    if list(bounds) != sorted(set(bounds)):
        raise ValueError("bounds must be strictly ascending")
    from pyspark.sql import Window as W

    ladder = " + ".join(
        [f"(CASE WHEN {len_col} >= {b} THEN 1 ELSE 0 END)" for b in bounds]
    ) or "0"
    w = W.partitionBy("bucket").orderBy(
        F.col(len_col), *[F.col(c) for c in key_cols]
    )
    return (
        chunks.withColumn("bucket", F.expr(f"CAST(({ladder}) AS INT)"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "batch_idx",
            F.expr(f"CAST((__rn - 1) DIV {batch_size} AS INT)"),
        )
        .withColumn(
            "batch_ord",
            F.expr(f"CAST((__rn - 1) % {batch_size} AS INT)"),
        )
        .drop("__rn")
    )


def padding_stats(
    batched: DataFrame, len_col: str = "n_tokens"
) -> DataFrame:
    """Per-batch padding accounting over ``length_bucketed_batches``
    output: (bucket, batch_idx, n_seqs, max_len, sum_len, padded) with
    ``padded = n_seqs·max_len − sum_len`` — the tokens a trainer
    computes attention over but never learns from. Exact integer
    counts; group-bounded exchange."""
    return (
        batched.groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.max(len_col).alias("max_len"),
            F.sum(len_col).alias("sum_len"),
        )
        .withColumn(
            "padded",
            F.col("n_seqs") * F.col("max_len") - F.col("sum_len"),
        )
    )
