"""Token-budget packing: every chunk lands in exactly one pack, no pack
exceeds the budget (oversized singletons excepted), totals preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators.packing import pack_chunks
from example_kafkastreams_spark.operators.text_chunks import chunk_documents
from tests.conftest import SMOKE

BUDGET = 96


def _chunks(spark):
    docs = load_table(spark, SMOKE, "documents")
    return chunk_documents(docs, chunk_size=32, stride=24)


def test_packs_respect_budget_and_conserve(spark):
    chunks = _chunks(spark)
    packed = pack_chunks(chunks, budget=BUDGET).cache()
    over = packed.filter(
        (F.col("n_tokens") > BUDGET) & (F.col("n_chunks") > 1)
    )
    assert over.count() == 0
    want = chunks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    got = packed.agg(
        F.sum("n_chunks").alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    assert (got["n"], got["t"]) == (want["n"], want["t"])
    packed.unpersist()


def test_pack_ids_unique_and_fill_reasonable(spark):
    chunks = _chunks(spark)
    packed = pack_chunks(chunks, budget=BUDGET).cache()
    n = packed.count()
    assert packed.select("pack_id").distinct().count() == n
    # greedy fill: average pack at least half the budget once the
    # partition holds many chunks (last pack per partition may be short)
    avg = packed.agg(F.avg("n_tokens")).first()[0]
    assert avg >= BUDGET / 2, avg
    packed.unpersist()


def test_oversized_chunk_ships_alone(spark):
    docs = load_table(spark, SMOKE, "documents")
    big = chunk_documents(docs, chunk_size=4096, stride=4096)
    packed = pack_chunks(big, budget=8)
    bad = packed.filter((F.col("n_tokens") > 8) & (F.col("n_chunks") != 1))
    assert bad.count() == 0


def _packed_key(rows):
    return sorted((r.pack_id, r.n_chunks, r.n_tokens, r.text) for r in rows)


def test_canonical_mode_partition_independent(spark):
    """canonical=True must produce the EXACT same packs (ids, contents,
    boundaries) under any input partitioning — the property the default
    mode documents away (VERDICT r3 item 3)."""
    chunks = _chunks(spark)
    base = _packed_key(pack_chunks(chunks, budget=BUDGET, canonical=True).collect())
    assert base, "no packs produced"
    for k in (1, 7, 32):
        got = _packed_key(
            pack_chunks(
                chunks.repartition(k), budget=BUDGET, canonical=True
            ).collect()
        )
        assert got == base, f"canonical output changed under repartition({k})"
    # and it still conserves chunks/tokens like the default mode
    want = chunks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    assert sum(r[1] for r in base) == want["n"]
    assert sum(r[2] for r in base) == want["t"]


def test_grouped_canonical_partition_independent_and_fills_better(spark):
    """The hybrid mode (canonical=True, group_docs=G) exists because
    the measured per-document fill loss on short-document corpora is
    ~31 points (BENCH packing_fill, VERDICT r4 item 4). It must keep
    canonical's defining property — byte-identical output under any
    input partitioning — while recovering fill by letting up to G
    consecutive documents share packs."""
    chunks = _chunks(spark)
    grouped = pack_chunks(
        chunks, budget=BUDGET, canonical=True, group_docs=16
    )
    base = _packed_key(grouped.collect())
    assert base, "no packs produced"
    for k in (1, 7, 32):
        got = _packed_key(
            pack_chunks(
                chunks.repartition(k), budget=BUDGET,
                canonical=True, group_docs=16,
            ).collect()
        )
        assert got == base, f"grouped output changed under repartition({k})"

    # conservation + budget, like every mode
    want = chunks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    assert sum(r[1] for r in base) == want["n"]
    assert sum(r[2] for r in base) == want["t"]
    assert all(r[2] <= BUDGET or r[1] == 1 for r in base)

    # the point of the hybrid: fill strictly better than per-document
    def fill(rows):
        return sum(r[2] for r in rows) / (len(rows) * BUDGET)

    perdoc = _packed_key(
        pack_chunks(chunks, budget=BUDGET, canonical=True).collect()
    )
    assert fill(base) > fill(perdoc), (fill(base), fill(perdoc))


def test_grouped_requires_canonical(spark):
    import pytest

    chunks = _chunks(spark)
    with pytest.raises(ValueError, match="requires canonical"):
        pack_chunks(chunks, budget=BUDGET, group_docs=4)


def test_canonical_mode_matches_duckdb_fold_oracle(spark):
    """The canonical per-document greedy fold is partition-independent,
    so its EXACT output (not just invariants) is cross-engine
    checkable: a DuckDB recursive CTE replays first-fit per document —
    new pack when the open pack can't take the chunk, close at >=
    budget — and must reproduce every pack id, chunk count, token
    total, and joined text byte-for-byte."""
    import duckdb

    chunks = _chunks(spark)
    got = _packed_key(pack_chunks(chunks, budget=BUDGET, canonical=True).collect())
    chunk_pdf = chunks.select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    ).toPandas()
    con = duckdb.connect()
    try:
        con.register("chunks", chunk_pdf)
        want = con.execute(f"""
        WITH RECURSIVE c AS (
          SELECT doc_id, chunk_text, n_tokens,
                 row_number() OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS rn
          FROM chunks
        ),
        fold(doc_id, rn, chunk_text, n_tokens, pack_seq, open_cum) AS (
          -- chunk 1 of each doc opens pack 0; a chunk reaching the
          -- budget closes its pack immediately (open_cum resets to 0)
          SELECT doc_id, rn, chunk_text, n_tokens, 0,
                 CASE WHEN n_tokens >= {BUDGET} THEN 0 ELSE n_tokens END
          FROM c WHERE rn = 1
          UNION ALL
          SELECT c.doc_id, c.rn, c.chunk_text, c.n_tokens,
                 CASE WHEN p.open_cum = 0 OR p.open_cum + c.n_tokens > {BUDGET}
                      THEN p.pack_seq + 1 ELSE p.pack_seq END,
                 CASE WHEN (CASE WHEN p.open_cum = 0
                                   OR p.open_cum + c.n_tokens > {BUDGET}
                                 THEN c.n_tokens
                                 ELSE p.open_cum + c.n_tokens END) >= {BUDGET}
                      THEN 0
                      ELSE (CASE WHEN p.open_cum = 0
                                   OR p.open_cum + c.n_tokens > {BUDGET}
                                 THEN c.n_tokens
                                 ELSE p.open_cum + c.n_tokens END) END
          FROM fold p JOIN c ON c.doc_id = p.doc_id AND c.rn = p.rn + 1
        )
        SELECT CAST(doc_id AS VARCHAR) || '-' || CAST(pack_seq AS VARCHAR) AS pack_id,
               CAST(count(*) AS INT) AS n_chunks,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               string_agg(chunk_text, chr(10) || chr(10) ORDER BY rn) AS text
        FROM fold GROUP BY doc_id, pack_seq
        """).fetchall()
    finally:
        con.close()
    assert got == sorted(want)


def test_write_training_shards_deterministic(spark, tmp_path):
    """Shard writes are reproducible (same rows per shard file across
    two runs), conserve every pack exactly once, and decorrelate
    order (the md5 permutation does not preserve pack adjacency)."""
    import glob

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.packing import (
        pack_chunks,
        write_training_shards,
    )
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
    )
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").limit(120)
    packs = pack_chunks(
        chunk_documents(docs, chunk_size=16, stride=16),
        budget=64,
        canonical=True,
    )
    out_a = str(tmp_path / "shards_a")
    out_b = str(tmp_path / "shards_b")
    write_training_shards(packs, out_a, num_shards=4)
    write_training_shards(packs, out_b, num_shards=4)

    def shard_map(path):
        return {
            d.split("=")[-1]: tuple(
                r.pack_id
                for r in spark.read.parquet(d).orderBy("pack_id").collect()
            )
            for d in sorted(glob.glob(path + "/__shard=*"))
        }

    a, b = shard_map(out_a), shard_map(out_b)
    assert a == b and len(a) == 4
    # conservation: every pack exactly once across shards
    all_ids = [p for s in a.values() for p in s]
    assert sorted(all_ids) == sorted(
        r.pack_id for r in packs.select("pack_id").collect()
    )
    # decorrelation: within a shard, consecutive rows (in stored
    # order) are rarely same-document neighbors
    first = spark.read.parquet(
        sorted(glob.glob(out_a + "/__shard=*"))[0]
    ).collect()
    docs_seq = [r.pack_id.split("-")[0] for r in first]
    adjacent_same = sum(
        1 for x, y in zip(docs_seq, docs_seq[1:]) if x == y
    )
    assert adjacent_same < len(docs_seq) / 2


def test_shard_assignment_is_the_writer_placement(spark, tmp_path):
    """shard_assignment (the q54 'shard' branch expression) IS the
    layout write_training_shards puts on disk, and both match a pure
    Python hashlib reference — placement is a function of the key,
    independent of engine, partitioning, and run."""
    import glob
    import hashlib

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.packing import (
        pack_chunks,
        shard_assignment,
        write_training_shards,
    )
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
    )
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").limit(100)
    packs = pack_chunks(
        chunk_documents(docs, chunk_size=16, stride=16),
        budget=64,
        canonical=True,
    )
    placed = {
        r.pack_id: (r["__shard"], r["__shard_ord"])
        for r in shard_assignment(packs, num_shards=4).collect()
    }
    # pure-Python reference: first 8 md5 hex digits mod n, full md5 ord
    for pid, (shard, ord_) in placed.items():
        h = hashlib.md5(pid.encode()).hexdigest()
        assert shard == int(h[:8], 16) % 4, pid
        assert ord_ == h, pid

    out = str(tmp_path / "shards")
    write_training_shards(packs, out, num_shards=4)
    on_disk = {
        r.pack_id: int(d.split("=")[-1])
        for d in glob.glob(out + "/__shard=*")
        for r in spark.read.parquet(d).select("pack_id").collect()
    }
    assert on_disk == {p: s for p, (s, _) in placed.items()}


def test_compact_training_shards(spark, tmp_path):
    """Folding the streaming shard store's per-batch leaves must keep
    the row set identical, hold back each run's frontier leaf (the
    only replayable one), re-sort the compacted leaf into the full
    md5 decorrelated order, stay idempotent, survive a crash-parked
    tree, and never break replay overwrite."""
    import glob
    import hashlib
    import os

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.packing import pack_chunks
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
    )
    from example_kafkastreams_spark.pipelines import (
        compact_training_shards,
        training_shards_sink,
    )
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").limit(60)
    packs = pack_chunks(
        chunk_documents(docs, chunk_size=16, stride=16),
        budget=64,
        canonical=True,
    ).cache()
    b0 = packs.filter(F.crc32(F.col("pack_id")) % 3 == 0)
    b1 = packs.filter(F.crc32(F.col("pack_id")) % 3 == 1)
    b2 = packs.filter(F.crc32(F.col("pack_id")) % 3 == 2)
    assert b0.count() and b1.count() and b2.count()

    out = str(tmp_path / "shard_store")
    sink_a = training_shards_sink(out, num_shards=4, run_id="ra")
    sink_a(b0, 0)
    sink_a(b1, 1)
    sink_b = training_shards_sink(out, num_shards=4, run_id="rb")
    sink_b(b2, 0)

    def rows():
        return {
            (r.pack_id, r["__shard"], r.n_tokens, r.text)
            for r in spark.read.parquet(out).collect()
        }

    def leaves():
        return sorted(
            os.path.relpath(p, out)
            for p in glob.glob(out + "/__shard=*/ingest_run=*/ingest_batch=*")
        )

    before = rows()
    compact_training_shards(spark, out)
    assert rows() == before
    tok_a = hashlib.md5(b"ra").hexdigest()[:16]
    tok_b = hashlib.md5(b"rb").hexdigest()[:16]
    after = leaves()
    # ra batch 0 folded; frontiers (ra/1, rb/0) held back verbatim
    assert not any(f"ingest_run={tok_a}/ingest_batch=0" in p for p in after)
    assert any(f"ingest_run={tok_a}/ingest_batch=1" in p for p in after)
    assert any(f"ingest_run={tok_b}/ingest_batch=0" in p for p in after)
    assert any("ingest_run=__compacted__" in p for p in after)

    # the compacted leaf carries the full-shard md5 order
    leaf = glob.glob(out + "/__shard=*/ingest_run=__compacted__/ingest_batch=0")[0]
    files = glob.glob(leaf + "/*.parquet")
    assert len(files) == 1
    import pyarrow.parquet as pq

    ids = pq.read_table(files[0], columns=["pack_id"])["pack_id"].to_pylist()
    assert [hashlib.md5(i.encode()).hexdigest() for i in ids] == sorted(
        hashlib.md5(i.encode()).hexdigest() for i in ids
    )

    # idempotent no-op; replay still overwrites its held-back leaf
    compact_training_shards(spark, out)
    assert rows() == before and leaves() == after
    sink_a(b1, 1)
    assert rows() == before

    # crash recovery: a parked tree with no live dir is restored
    os.rename(out, out + ".__pre_compact__")
    compact_training_shards(spark, out)
    assert rows() == before
    packs.unpersist()


def test_pack_assignments_match_canonical_packer(spark):
    """The assignment table is the membership view of
    pack_chunks(canonical=True): grouped per pack_id it reproduces the
    packer's (n_chunks, n_tokens) exactly; offsets are contiguous
    (each chunk starts where the previous ended) and never exceed the
    budget; the table is repartition-invariant."""
    from example_kafkastreams_spark.operators.packing import (
        pack_assignments,
    )

    chunks = _chunks(spark)
    packs = {
        r.pack_id: (r.n_chunks, r.n_tokens)
        for r in pack_chunks(chunks, BUDGET, canonical=True).collect()
    }
    asg = pack_assignments(chunks, BUDGET).toPandas()
    grouped = asg.groupby("pack_id").agg(
        n_chunks=("chunk_idx", "count"), n_tokens=("n_tokens", "sum")
    )
    got = {
        pid: (int(r.n_chunks), int(r.n_tokens))
        for pid, r in grouped.iterrows()
    }
    assert got == packs

    for _, g in asg.sort_values(["pack_id", "chunk_idx"]).groupby("pack_id"):
        expect = 0
        for _, row in g.iterrows():
            assert row.pack_offset == expect  # contiguous content tokens
            expect += row.n_tokens
        assert expect <= max(BUDGET, g.n_tokens.max())

    again = pack_assignments(chunks.repartition(17), BUDGET).toPandas()
    key = ["pack_id", "doc_id", "chunk_idx", "pack_offset", "n_tokens"]
    assert sorted(map(tuple, asg[key].values.tolist())) == sorted(
        map(tuple, again[key].values.tolist())
    )


def test_pack_assignments_oversized_and_exact_fit(spark):
    """An oversized chunk ships alone in its own pack (offset 0) and
    the fold continues cleanly after it; an exact-budget fit closes
    the pack so the next chunk starts a new one at offset 0."""
    from example_kafkastreams_spark.operators.packing import (
        pack_assignments,
    )

    rows = [
        # doc 1: 40 + 200(oversized) + 30 + 66 (exact close) + 5
        (1, 1, "a", 40), (1, 2, "b", 200), (1, 3, "c", 30),
        (1, 4, "d", 66), (1, 5, "e", 5),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, chunk_text string, n_tokens int"
    )
    got = {
        r.chunk_idx: (r.pack_id, r.pack_offset)
        for r in pack_assignments(chunks, budget=96).collect()
    }
    assert got[1] == ("1-0", 0)
    assert got[2] == ("1-1", 0)      # oversized: alone, closes at once
    assert got[3] == ("1-2", 0)      # fold continues in a fresh pack
    assert got[4] == ("1-2", 30)     # 30 + 66 = 96 exactly -> closes
    assert got[5] == ("1-3", 0)      # next starts a new pack


# --- length-bucketed batching -----------------------------------------------

def test_length_bucketed_batches_canonical_and_partition_independent(spark):
    from example_kafkastreams_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(d, c, 1 + (d * 7 + c * 3) % 32) for d in range(20)
            for c in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_tokens int"
    )
    a = length_bucketed_batches(df.repartition(1), 4, (9, 17, 25))
    b = length_bucketed_batches(df.repartition(16), 4, (9, 17, 25))
    ka = sorted(map(tuple, a.collect()))
    assert ka == sorted(map(tuple, b.collect()))
    # bucket ladder: lengths 1-8 -> 0, 9-16 -> 1, 17-24 -> 2, 25+ -> 3
    for r in a.collect():
        want = sum(r.n_tokens >= x for x in (9, 17, 25))
        assert r.bucket == want
        assert 0 <= r.batch_ord < 4


def test_length_bucketing_reduces_padding_vs_arrival_order(spark):
    """The measurable claim: padding waste under length bucketing is
    <= waste under arrival-order batching of the same sequences (and
    strictly less on mixed-length data)."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.packing import (
        length_bucketed_batches,
        padding_stats,
    )

    # alternating short/long arrival order — the worst case for
    # arrival batching
    rows = [(i, 0, 4 if i % 2 == 0 else 32) for i in range(64)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_tokens int"
    )
    bucketed = padding_stats(
        length_bucketed_batches(df, 8, (9, 17, 25))
    ).agg(F.sum("padded")).first()[0]
    arrival = padding_stats(
        length_bucketed_batches(df, 8, ()).withColumn(
            "bucket", F.lit(0)
        ).withColumn(
            "batch_idx", F.expr("CAST(doc_id DIV 8 AS INT)")
        )
    ).agg(F.sum("padded")).first()[0]
    assert bucketed < arrival
    assert bucketed == 0  # equal lengths within each bucket here


def test_length_bucketed_batches_validates_args(spark):
    import pytest

    from example_kafkastreams_spark.operators.packing import (
        length_bucketed_batches,
    )

    df = spark.createDataFrame(
        [(1, 0, 5)], "doc_id long, chunk_idx int, n_tokens int"
    )
    with pytest.raises(ValueError, match="batch_size"):
        length_bucketed_batches(df, 0, (4,))
    with pytest.raises(ValueError, match="ascending"):
        length_bucketed_batches(df, 2, (9, 9))
