"""Bloom membership sketch + bloom-prefiltered decontamination."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.sketches import (
    bloom_member_sql,
    bloom_probe_expr,
    bloom_vector,
    bloom_words,
    bloom_words_sql,
)


def _vals(spark, n, prefix="tok"):
    return spark.createDataFrame(
        [(f"{prefix}{i}",) for i in range(n)], "v string"
    )


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    members = _vals(spark, 400)
    vec = bloom_vector(bloom_words(members))
    probe = _vals(spark, 1200)  # 400 members + 800 non-members
    got = {
        r.v: r.m
        for r in probe.select(
            "v", F.expr(bloom_probe_expr("v", vec)).alias("m")
        ).collect()
    }
    assert all(got[f"tok{i}"] for i in range(400))  # never a false negative
    fp = sum(1 for i in range(400, 1200) if got[f"tok{i}"])
    # m=8192, k=4, n=400: theoretical FPR ~0.08%; allow generous slack
    assert fp <= 8, fp


def test_bloom_cross_engine_exact(spark):
    members = _vals(spark, 300)
    vec = bloom_vector(bloom_words(members))
    probe = _vals(spark, 600)
    spark_m = {
        r.v: r.m
        for r in probe.select(
            "v", F.expr(bloom_probe_expr("v", vec)).alias("m")
        ).collect()
    }
    lit = lambda i: "'tok" + str(i) + "'"
    vals_sql = (
        "SELECT unnest([" + ",".join(lit(i) for i in range(300)) + "]) AS v"
    )
    probes_sql = (
        "SELECT unnest([" + ",".join(lit(i) for i in range(600)) + "]) AS v"
    )
    sql = (
        "WITH bloomregs AS (" + bloom_words_sql(vals_sql) + ") "
        + bloom_member_sql(probes_sql, "bloomregs")
    )
    duck = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert duck == spark_m


def test_bloom_words_bounded_and_partition_invariant(spark):
    members = _vals(spark, 5000)
    w1 = bloom_words(members)
    assert w1.count() <= 8192 // 32
    a = sorted(map(tuple, w1.collect()))
    b = sorted(map(tuple, bloom_words(members.repartition(13)).collect()))
    assert a == b


def test_bloom_merge_equals_build_on_union_and_is_idempotent(spark):
    """Word-wise OR merge == one-shot build over the unioned input
    (exactly), and re-merging the same filter is a no-op — the
    replay-safety property a streaming maintenance sink leans on."""
    from example_kafkastreams_spark.operators.sketches import bloom_merge

    a, b = _vals(spark, 200), _vals(spark, 200, prefix="other")
    wa, wb = bloom_words(a), bloom_words(b)
    merged = sorted(map(tuple, bloom_merge(wa, wb).collect()))
    oneshot = sorted(
        map(tuple, bloom_words(a.unionByName(b)).collect())
    )
    assert merged == oneshot
    again = sorted(
        map(tuple, bloom_merge(bloom_merge(wa, wb), wb).collect())
    )
    assert again == merged


def test_cms_merge_is_counter_sum(spark):
    from example_kafkastreams_spark.operators.sketches import (
        cms_merge,
        count_min_counters,
    )

    a, b = _vals(spark, 150), _vals(spark, 150)  # identical multisets
    ca = count_min_counters(a, "v")
    merged = {
        (r.d, r.bucket): r.cnt
        for r in cms_merge(ca, count_min_counters(b, "v")).collect()
    }
    oneshot = {
        (r.d, r.bucket): r.cnt
        for r in count_min_counters(a.unionByName(b), "v").collect()
    }
    assert merged == oneshot
    single = {(r.d, r.bucket): r.cnt for r in ca.collect()}
    assert all(merged[k] == 2 * single[k] for k in single)


def test_bloom_cardinality_estimate(spark):
    from example_kafkastreams_spark.operators.sketches import (
        bloom_cardinality_estimate,
    )

    for n in (50, 200, 800):
        vec = bloom_vector(bloom_words(_vals(spark, n)))
        est = bloom_cardinality_estimate(vec)
        assert abs(est - n) / n < 0.15, (n, est)
    assert bloom_cardinality_estimate([0] * 256) == 0.0
    assert bloom_cardinality_estimate([-1] * 256) == float("inf")


def test_bloom_store_stream_equals_batch_build(spark, tmp_path):
    """Golden: values split across micro-batches through the
    bloom_store_sink leave the stored filter EQUAL to the one-shot
    build over all values (OR-merge associativity), through a real
    file-backed streaming query."""
    import pyspark.sql.types as T

    from example_kafkastreams_spark.operators.sketches import (
        bloom_store_read,
        bloom_store_sink,
    )
    from example_kafkastreams_spark.streaming.sources import (
        file_stream,
        stage_replayable_batches,
    )

    batches = [
        [(f"tok{i}",) for i in range(0, 100)],
        [(f"tok{i}",) for i in range(100, 180)],
        [(f"tok{i}",) for i in range(150, 260)],  # overlap: OR no-op
    ]
    schema = T.StructType().add("v", "string")
    src = str(tmp_path / "in")
    stage_replayable_batches(spark, src, schema, batches)
    store = str(tmp_path / "bloom")
    q = (
        file_stream(spark, src, schema, max_files_per_trigger=1)
        .writeStream.foreachBatch(bloom_store_sink(spark, store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(map(tuple, bloom_store_read(spark, store).collect()))
    want = sorted(map(tuple, bloom_words(_vals(spark, 260)).collect()))
    assert got == want


def test_bloom_store_sink_replay_and_crash_heal(spark, tmp_path):
    """OR is idempotent: re-invoking the sink with the same batch is a
    storage no-op with no bookkeeping at all; a crash between the two
    publish renames (store dir missing, .__old__ present) keeps the
    previous filter serving and the replay republishes."""
    import os
    import shutil

    from example_kafkastreams_spark.operators.sketches import (
        bloom_store_read,
        bloom_store_sink,
    )

    store = str(tmp_path / "bloom")
    sink = bloom_store_sink(spark, store)
    b0 = _vals(spark, 100)
    b1 = spark.createDataFrame(
        [(f"tok{i}",) for i in range(100, 200)], "v string"
    )
    sink(b0, 0)
    sink(b1, 1)
    rows1 = sorted(map(tuple, bloom_store_read(spark, store).collect()))
    sink(b1, 1)  # replay: idempotent merge
    assert sorted(
        map(tuple, bloom_store_read(spark, store).collect())
    ) == rows1

    # crash simulation: mid-publish state (store renamed away)
    os.rename(store, store + ".__old__")
    assert sorted(
        map(tuple, bloom_store_read(spark, store).collect())
    ) is not None  # previous filter still serves from .__old__
    sink(b1, 1)  # the replay heals the store
    assert sorted(
        map(tuple, bloom_store_read(spark, store).collect())
    ) == rows1
    assert not os.path.exists(store + ".__old__")
    shutil.rmtree(store, ignore_errors=True)


def test_bloom_decontam_superset_of_exact_and_map_side(spark):
    """The bloom prefilter must flag every exactly-contaminated doc
    (no false negatives), and its probe plan must cross zero
    exchanges — the whole filter lives in the plan literals."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.decontam import (
        contamination_report,
        contamination_report_bloom,
    )
    from example_kafkastreams_spark.plans import count_exchanges
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    exact_ids = {
        r.doc_id for r in contamination_report(train, bench).collect()
    }
    bloom_df = contamination_report_bloom(train, bench)
    assert count_exchanges(bloom_df) == 0
    flagged = {
        r.doc_id for r in bloom_df.filter("contaminated").collect()
    }
    assert exact_ids <= flagged


def test_bloom_store_sink_recovery_batch_keeps_fallback_readable(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9 regression: in a RECOVERY batch (store dir missing,
    .__old__ serving), the sink must NOT delete .__old__ before the
    publish rename — a crash in that window would otherwise leave no
    _SUCCESS-bearing copy and the next replay would silently rebuild
    from None, dropping all pre-batch history."""
    import os

    from example_kafkastreams_spark.operators.sketches import (
        bloom_store_read,
        bloom_store_sink,
    )

    store = str(tmp_path / "bloom")
    sink = bloom_store_sink(spark, store)
    sink(_vals(spark, 100), 0)
    served = sorted(map(tuple, bloom_store_read(spark, store).collect()))

    # crash state: mid-publish of some later batch — store renamed
    # away, .__old__ is the only readable copy
    os.rename(store, store + ".__old__")

    # the recovery batch itself crashes right at the publish rename
    real_rename = os.rename

    def exploding_rename(src, dst):
        if dst == store:
            raise OSError("simulated crash at publish")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", exploding_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated crash"):
        sink(_vals(spark, 100), 1)
    monkeypatch.setattr(os, "rename", real_rename)

    # the previous filter MUST still serve (pre-fix: .__old__ was
    # rmtree'd before the rename and this read returned None)
    cur = bloom_store_read(spark, store)
    assert cur is not None
    assert sorted(map(tuple, cur.collect())) == served

    # and the replay completes the recovery
    sink(_vals(spark, 100), 1)
    assert sorted(
        map(tuple, bloom_store_read(spark, store).collect())
    ) == served
    assert not os.path.exists(store + ".__old__")


def test_bloom_rejects_bad_m_bits(spark):
    """ADVICE r9 regression: a non-multiple-of-32 (or non-positive)
    m_bits would index past the packed word vector — IndexError on
    build or a NULL element_at probing, i.e. silent FALSE NEGATIVES.
    Every entry point rejects it."""
    import pytest as _pytest

    from example_kafkastreams_spark.operators.sketches import (
        bloom_member_sql,
        bloom_probe_expr,
        bloom_vector,
        bloom_words,
        bloom_words_sql,
    )

    vals = _vals(spark, 10)
    for bad in (100, 0, -32, 33):
        with _pytest.raises(ValueError, match="multiple of 32"):
            bloom_words(vals, "v", m_bits=bad)
        with _pytest.raises(ValueError, match="multiple of 32"):
            bloom_words_sql("SELECT 'a' AS v", m_bits=bad)
        with _pytest.raises(ValueError, match="multiple of 32"):
            bloom_vector(vals, m_bits=bad)
        with _pytest.raises(ValueError, match="multiple of 32"):
            bloom_probe_expr("v", [0] * 4, m_bits=bad)
        with _pytest.raises(ValueError, match="multiple of 32"):
            bloom_member_sql("SELECT 'a' AS v", "regs", m_bits=bad)
