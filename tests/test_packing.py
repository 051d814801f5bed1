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
