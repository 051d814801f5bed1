"""Index compaction (operators.index_maint.compact_index) — VERDICT r6
item 2's three bars: UNIT (admission decisions identical before /
after / mid-crash for the digest, band, and whash grains), PLAN (the
compacted catalog joins with no index-side exchange), GOLDEN (ingest +
frontier replay keep working across a compaction) — plus the ADVICE r7
contracts: additive-then-prune crash safety, frontier hold-back,
unmatchable __compacted__ token, local-path guard."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F, types as T

from example_kafkastreams_spark.operators.index_maint import (
    COMPACTED_RUN,
    compact_index,
)
from example_kafkastreams_spark.operators.neardup import (
    admit_against_band_index,
    incremental_exact_dedup,
    minhash_band_index,
)

RUN_A = "a" * 16
RUN_B = "b" * 16

BASE = [
    "the quick brown fox jumps over the lazy dog near the old river bank",
    "a tall green tree stands alone on the wide open hill above the town",
    "many small boats sail across the calm blue sea under a bright sky",
    "the old stone house at the end of the road has a red wooden door",
    "fresh bread and warm soup wait on the long table in the quiet room",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _variant(text, i):
    toks = text.split()
    toks[i % len(toks)] = f"tok{i}"
    return " ".join(toks)


def _write_part(df, path, run, batch):
    (
        df.select(
            "*",
            F.lit(run).alias("ingest_run"),
            F.lit(batch).alias("ingest_batch"),
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_run", "ingest_batch")
        .parquet(path)
    )


def test_compacted_run_token_unmatchable():
    """No real sink token (a 16-hex md5/uuid slice) can equal the
    synthetic partition value, so a replay-exclusion filter can never
    remove the compacted partition."""
    assert re.fullmatch(r"[0-9a-f]{16}", COMPACTED_RUN) is None


def test_non_local_path_raises(spark):
    with pytest.raises(ValueError, match="local"):
        compact_index(spark, "s3://bucket/idx", ["content_hash"])
    with pytest.raises(ValueError, match="non-local"):
        compact_index(
            spark, "file://otherhost/idx", ["content_hash"]
        )


def test_digest_admission_identical_after_compaction(spark, tmp_path):
    """The digest grain: incremental_exact_dedup must make the SAME
    decisions against the compacted path, the bucketed catalog, and a
    mid-crash superset state as against the raw per-batch layout."""
    path = str(tmp_path / "digest_index")
    corpus1 = _docs(spark, [(i, BASE[i]) for i in range(3)])
    corpus2 = _docs(spark, [(10, BASE[3]), (11, BASE[0])])  # 11 dups 0
    corpus3 = _docs(spark, [(20, BASE[4])])
    dig = lambda d: d.select(  # noqa: E731
        "doc_id", F.md5(F.col("text")).alias("content_hash")
    )
    _write_part(dig(corpus1), path, RUN_A, 0)
    _write_part(dig(corpus2), path, RUN_A, 1)
    _write_part(dig(corpus3), path, RUN_B, 0)

    delta = _docs(
        spark,
        [(30, BASE[1]), (31, BASE[4]), (32, "genuinely new text here ok")],
    )
    before = sorted(
        map(
            tuple,
            incremental_exact_dedup(
                delta, spark.read.parquet(path)
            ).collect(),
        )
    )
    keys_before = {
        r.content_hash
        for r in spark.read.parquet(path).select("content_hash").collect()
    }

    catalog = compact_index(
        spark, path, ["content_hash"], id_col="doc_id",
        table_name="idx_t_digest",
    )
    reread = spark.read.parquet(path)
    assert {
        r.content_hash for r in reread.select("content_hash").collect()
    } == keys_before
    for idx in (reread, catalog):
        assert (
            sorted(
                map(
                    tuple,
                    incremental_exact_dedup(delta, idx).collect(),
                )
            )
            == before
        )
    # mid-crash state: compacted partition written, prune not yet run —
    # the index is a SUPERSET with duplicate keys; decisions identical
    superset = reread.unionByName(
        dig(corpus1).select(
            "doc_id",
            "content_hash",
            F.lit(RUN_A).alias("ingest_run"),
            F.lit(0).alias("ingest_batch"),
        )
    )
    assert (
        sorted(
            map(tuple, incremental_exact_dedup(delta, superset).collect())
        )
        == before
    )


def test_band_admission_identical_after_compaction(spark, tmp_path):
    """The band grain: admit_against_band_index over the compacted
    index (path re-read AND bucketed catalog) must admit exactly the
    docs the raw layout admits."""
    path = str(tmp_path / "band_index")
    b0 = _docs(spark, [(i, BASE[i]) for i in range(4)])
    _, d0 = admit_against_band_index(b0, None)
    _write_part(d0, path, RUN_A, 0)
    b1 = _docs(spark, [(10, _variant(BASE[0], 1)), (11, BASE[4])])
    _, d1 = admit_against_band_index(b1, spark.read.parquet(path))
    _write_part(d1, path, RUN_A, 1)

    delta = _docs(
        spark,
        [
            (20, _variant(BASE[4], 2)),   # near-dups batch-1 content
            (21, _variant(BASE[2], 3)),   # near-dups batch-0 content
            (22, "entirely different words about winter snow and hail"),
        ],
    )

    def decide(idx):
        surv, _ = admit_against_band_index(delta, idx)
        return sorted(r.doc_id for r in surv.collect())

    before = decide(spark.read.parquet(path))
    catalog = compact_index(
        spark, path, ["band_idx", "band_key"], id_col="doc_id",
        table_name="idx_t_band",
    )
    # frontier (RUN_A batch 1) held back, batch 0 folded
    assert os.path.isdir(
        os.path.join(path, f"ingest_run={COMPACTED_RUN}")
    )
    assert os.path.isdir(
        os.path.join(path, f"ingest_run={RUN_A}", "ingest_batch=1")
    )
    assert not os.path.isdir(
        os.path.join(path, f"ingest_run={RUN_A}", "ingest_batch=0")
    )
    assert decide(spark.read.parquet(path)) == before
    assert decide(catalog) == before


def test_whash_static_layout_compaction(spark, tmp_path):
    """The whash grain has no id and (as a batch-built artifact) no
    ingest partitions: compaction dedups to distinct keys in place and
    the flagged-window semi-join sees the identical set."""
    from example_kafkastreams_spark.operators.substr_dedup import (
        window_hash_index,
    )

    path = str(tmp_path / "whash_index")
    docs = _docs(
        spark, [(i, BASE[i % 5] + " " + BASE[(i + 1) % 5]) for i in range(6)]
    )
    idx = window_hash_index(docs, k=8)
    # simulate accumulated duplicates from repeated appends
    idx.unionByName(idx).write.parquet(path)
    keys = {r.whash for r in spark.read.parquet(path).distinct().collect()}
    n_dup = spark.read.parquet(path).count()
    assert n_dup == 2 * len(keys)

    compact_index(
        spark, path, ["whash"], id_col=None, table_name="idx_t_whash"
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == len(keys)
    assert {r.whash for r in rows} == keys


def test_recompaction_idempotent(spark, tmp_path):
    path = str(tmp_path / "digest_index")
    d = _docs(spark, [(i, BASE[i]) for i in range(3)])
    dig = d.select("doc_id", F.md5("text").alias("content_hash"))
    _write_part(dig, path, RUN_A, 0)
    _write_part(dig, path, RUN_A, 1)  # same keys again
    _write_part(dig, path, RUN_A, 2)
    compact_index(
        spark, path, ["content_hash"], id_col="doc_id",
        table_name="idx_t_re",
    )
    state1 = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    # nothing new arrived: second compaction must be a no-op
    compact_index(
        spark, path, ["content_hash"], id_col="doc_id",
        table_name="idx_t_re",
    )
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == state1


def test_catalog_join_saves_index_exchange(spark, tmp_path):
    """The point of the bucketed catalog: the index side of the delta
    edge join needs no exchange (one fewer than a plain parquet read
    of the same compacted path)."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.neardup import (
        incremental_minhash_edges,
    )
    from example_kafkastreams_spark.plans import count_exchanges

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "band_index")
    _write_part(minhash_band_index(corpus), path, RUN_A, 0)
    _write_part(
        minhash_band_index(
            corpus.limit(0)
        ),  # empty frontier so batch 0 folds
        path, RUN_A, 1,
    )
    catalog = compact_index(
        spark, path, ["band_idx", "band_key"], id_col="doc_id",
        num_buckets=8, table_name="idx_t_plan",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e_plain, _ = incremental_minhash_edges(
            delta, spark.read.parquet(path).drop(
                "ingest_run", "ingest_batch"
            )
        )
        e_cat, _ = incremental_minhash_edges(delta, catalog)
        assert count_exchanges(e_cat) == count_exchanges(e_plain) - 1, (
            e_cat._jdf.queryExecution().toString()
        )
        assert sorted(map(tuple, e_cat.collect())) == sorted(
            map(tuple, e_plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_ingest_and_frontier_replay_across_compaction(spark, tmp_path):
    """GOLDEN: the streaming near-dup sink keeps working across a
    compaction — the ADVICE r7 hazard shape. Batch 7 commits, batch 8
    is the frontier; compaction folds 7 and holds 8 back; a
    foreachBatch REPLAY of frontier batch 8 (crash after index write,
    before offset commit) still excludes its own partition and leaves
    both stores byte-identical; the folded history still gates a new
    run's paraphrase."""
    from example_kafkastreams_spark.pipelines import (
        corpus_ingest_with_neardup_index,
    )
    from example_kafkastreams_spark.streaming.sources import (
        file_stream,
        stage_replayable_batches,
    )
    from tests.test_streaming import DOC_STREAM_SCHEMA, at

    base = (
        "the quick brown fox jumps over the lazy dog and runs on to"
        " the house of the friend by the long road near the old mill"
    )
    toks = base.split()
    toks[-1] = "tokx"
    variant = " ".join(toks)
    other = (
        "a small dog and a big cat sat in the sun by the door of the"
        " house for most of the day and then went away to sleep deeply"
    )
    third = (
        "fresh bread and warm soup wait on the long table in the quiet"
        " room where the family meets at the end of every single day"
    )

    idx = str(tmp_path / "band_index")
    out = str(tmp_path / "admitted")
    src = str(tmp_path / "in")
    stage_replayable_batches(
        spark, src, DOC_STREAM_SCHEMA, [[(1, base, "s", at(0.0))]]
    )
    stream = file_stream(spark, src, DOC_STREAM_SCHEMA)
    _, mk = corpus_ingest_with_neardup_index(
        stream, spark, idx, ts_col="ts"
    )
    sink = mk(out, run_id=str(tmp_path / "ckpt"))

    batch_schema = T.StructType(
        list(DOC_STREAM_SCHEMA.fields)
        + [T.StructField("content_hash", T.StringType())]
    )
    batch7 = spark.createDataFrame(
        [
            (1, base, "s", at(0.0), "a" * 32),
            (2, variant, "s", at(1.0), "b" * 32),
        ],
        batch_schema,
    )
    batch8 = spark.createDataFrame(
        [(3, other, "s", at(2.0), "c" * 32)], batch_schema
    )
    sink(batch7, 7)
    sink(batch8, 8)
    survivors = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert [d for d, _ in survivors] == [1, 3]

    compact_index(
        spark, idx, ["band_idx", "band_key"], id_col="doc_id",
        table_name="idx_t_golden",
    )
    # frontier batch 8 held; batch 7 folded into __compacted__
    run_tok = next(
        e.split("=", 1)[1]
        for e in os.listdir(idx)
        if e.startswith("ingest_run=") and COMPACTED_RUN not in e
    )
    assert os.path.isdir(
        os.path.join(idx, f"ingest_run={run_tok}", "ingest_batch=8")
    )
    assert not os.path.isdir(
        os.path.join(idx, f"ingest_run={run_tok}", "ingest_batch=7")
    )
    index_rows = sorted(
        (r.doc_id, r.band_idx, r.band_key)
        for r in spark.read.parquet(idx).collect()
    )

    # REPLAY the frontier batch post-compaction: byte-identical stores
    sink(batch8, 8)
    assert (
        sorted(
            (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
        )
        == survivors
    )
    assert (
        sorted(
            (r.doc_id, r.band_idx, r.band_key)
            for r in spark.read.parquet(idx).collect()
        )
        == index_rows
    )

    # the folded history still gates: batch 9 pairs a paraphrase of the
    # COMPACTED doc 1 with genuinely new content
    toks2 = base.split()
    toks2[-1] = "toky"
    batch9 = spark.createDataFrame(
        [
            (4, " ".join(toks2), "s", at(3.0), "d" * 32),
            (5, third, "s", at(4.0), "e" * 32),
        ],
        batch_schema,
    )
    sink(batch9, 9)
    assert {
        r.doc_id for r in spark.read.parquet(out).collect()
    } == {1, 3, 5}


def test_srp_admission_identical_after_compaction(spark, tmp_path):
    """The embedding grain: admit_against_srp_index must make the SAME
    decisions against the compacted path and the bucketed catalog as
    against the raw per-batch layout. Keys here are (embedding,
    bucket) — compaction groups on a float-array column, the one grain
    whose canonical-rep key is not a scalar hash."""
    from example_kafkastreams_spark.operators.knn import (
        admit_against_srp_index,
        hyperplanes,
        srp_bucket_index,
    )

    planes = hyperplanes(4, 4)
    path = str(tmp_path / "srp_index")

    def emb(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    v1 = [1.0, 0.25, -0.5, 2.0]
    v2 = [-0.25, 1.0, 2.0, 0.5]       # orthogonal to v1
    v3 = [0.5, -2.0, 1.0, 0.25]       # orthogonal to both
    sc = lambda v, s: [s * x for x in v]  # noqa: E731
    _write_part(
        srp_bucket_index(emb([(1, v1), (2, v2)]), planes=planes),
        path, RUN_A, 0,
    )
    # scaled copy of v1: distinct vector, same bucket — a second rep
    # for v1's direction lands in a LATER batch, so the folded
    # partition and a held-back frontier partition carry colliding
    # buckets (the dedup across partitions must not merge reps of
    # DISTINCT vectors)
    _write_part(
        srp_bucket_index(emb([(3, sc(v1, 2.0))]), planes=planes),
        path, RUN_A, 1,
    )
    _write_part(
        srp_bucket_index(emb([(4, v3)]), planes=planes),
        path, RUN_B, 0,
    )

    delta = emb([(30, sc(v1, 3.0)), (31, sc(v2, 2.0)), (32, sc(v3, 0.5)),
                 (33, [1.0, 1.0, 1.0, 1.0])])

    def decide(idx):
        surv, idx_delta = admit_against_srp_index(
            delta, idx, threshold=0.9, planes=planes
        )
        return (
            sorted(r.vec_id for r in surv.collect()),
            sorted(r.vec_id for r in idx_delta.collect()),
        )

    before = decide(spark.read.parquet(path))
    rows_before = spark.read.parquet(path).count()

    catalog = compact_index(
        spark, path, ["bucket"], id_col="vec_id",
        table_name="idx_t_srp",
    )
    reread = spark.read.parquet(path)
    # all distinct vectors are distinct reps — nothing merges, every
    # rep survives the fold (frontier partitions held back unchanged)
    assert reread.count() == rows_before
    assert {r.vec_id for r in reread.collect()} == {1, 2, 3, 4}
    for idx in (reread, catalog):
        assert decide(idx) == before
    spark.sql("DROP TABLE IF EXISTS idx_t_srp")
