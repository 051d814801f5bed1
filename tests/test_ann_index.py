"""Persistent ANN index: a query against the stored artifact must be
BIT-IDENTICAL to the fresh in-session build (floats round-trip JSON
exactly; the scoring path is literally shared code)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators.ann_index import (
    ann_index_query,
    ann_index_read,
    ivfpq_index_write,
    pq_index_write,
)
from example_kafkastreams_spark.operators.knn import ivf_pq_ann, pq_ann

SMOKE = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pq_index_roundtrip_matches_fresh_build(spark, tmp_path):
    emb = load_table(spark, SMOKE, "embeddings")
    path = str(tmp_path / "pq_idx")
    pq_index_write(emb, path, m=8, num_codes=16)

    enc, meta = ann_index_read(spark, path)
    assert meta["kind"] == "pq" and len(meta["codebook"]) == 8
    assert enc.columns == ["vec_id", "codes"]

    queries = emb.filter(F.col("vec_id") < 8)
    got = ann_index_query(spark, path, queries, k=3)
    want = pq_ann(emb, num_queries=8, k=3, m=8, num_codes=16)
    assert _rows(got) == _rows(want)


def test_ivfpq_index_roundtrip_matches_fresh_build(spark, tmp_path):
    emb = load_table(spark, SMOKE, "embeddings")
    path = str(tmp_path / "ivfpq_idx")
    ivfpq_index_write(emb, path, num_centroids=8, m=8, num_codes=16)

    enc, meta = ann_index_read(spark, path)
    assert meta["kind"] == "ivfpq" and len(meta["centroids"]) == 8
    assert enc.columns == ["vec_id", "cell", "codes"]

    queries = emb.filter(F.col("vec_id") < 8)
    got = ann_index_query(spark, path, queries, k=3, nprobe=2)
    want = ivf_pq_ann(emb, num_queries=8, k=3, nprobe=2)
    assert _rows(got) == _rows(want)


def test_ivfpq_index_query_prunes_cells(spark, tmp_path):
    """The probed-cell predicate must reach the codes parquet scan as
    a pushed filter — the IVF promise survives storage."""
    from example_kafkastreams_spark.plans import pushed_filters

    emb = load_table(spark, SMOKE, "embeddings")
    path = str(tmp_path / "ivfpq_idx2")
    ivfpq_index_write(emb, path, num_centroids=8, m=8, num_codes=16)
    queries = emb.filter(F.col("vec_id") < 2)
    out = ann_index_query(spark, path, queries, k=3, nprobe=1)
    pushed = " ".join(pushed_filters(out))
    # single probed cell compiles to EqualTo, several to In — either
    # way the cell predicate must reach the scan
    assert "EqualTo(cell" in pushed or "In(cell" in pushed, pushed


def test_empty_query_frame_returns_typed_empty(spark, tmp_path):
    emb = load_table(spark, SMOKE, "embeddings")
    path = str(tmp_path / "pq_idx3")
    pq_index_write(emb, path)
    out = ann_index_query(
        spark, path, emb.filter(F.col("vec_id") < 0), k=3
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "approx_d2", "knn_rank"]
