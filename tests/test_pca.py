"""Sampled PCA projection + PCA-shortlisted search (operators/knn.py)."""

from __future__ import annotations

import math
import random

import numpy as np
from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators.knn import (
    brute_force_knn,
    matryoshka_knn,
    pca_knn,
    pca_project,
    pca_train,
)
from tests.conftest import SMOKE


def _aniso_emb(spark, n=400, dim=64, seed=11):
    """Anisotropic corpus: tiny noise everywhere, the real signal in
    dims 40-47 — the regime where a raw prefix misses everything and
    a trained basis must not."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.gauss(0, 0.05) for _ in range(dim)]
        for d in range(40, 48):
            v[d] += rng.gauss(0, 1.0)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pca_projection_matches_numpy(spark):
    emb = load_table(spark, SMOKE, "embeddings")
    mean, comps = pca_train(emb, out_dim=8)
    got = {
        r.vec_id: list(r.reduced)
        for r in pca_project(emb, mean, comps).select(
            "vec_id", "reduced"
        ).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    m = np.asarray(mean)
    c = np.asarray(comps)
    for r in rows:
        want = c @ (np.asarray(list(r.embedding), dtype=np.float64) - m)
        assert np.allclose(got[r.vec_id], want, atol=1e-9), r.vec_id


def test_pca_basis_orthonormal_variance_descending(spark):
    emb = _aniso_emb(spark)
    mean, comps = pca_train(emb, out_dim=8, sample_n=256)
    c = np.asarray(comps)
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-9)
    # projected sample variance must descend along components
    x = np.asarray(
        [list(r.embedding) for r in emb.filter(
            F.col("vec_id") < 256
        ).orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    var = ((x - x.mean(0)) @ c.T).var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(7)), var
    # signs canonical: largest-|.| coordinate positive
    for row in c:
        assert row[int(np.abs(row).argmax())] > 0


def test_pca_knn_full_shortlist_equals_brute(spark):
    emb = load_table(spark, SMOKE, "embeddings")
    brute = sorted(
        (r.query_id, r.knn_rank, r.neighbor_id, r.cosine)
        for r in brute_force_knn(emb, num_queries=8, k=5).collect()
    )
    full = sorted(
        (r.query_id, r.knn_rank, r.neighbor_id, r.cosine)
        for r in pca_knn(
            emb, num_queries=8, k=5, out_dim=16, shortlist=10**6
        ).collect()
    )
    assert full == brute


def test_pca_front_beats_prefix_on_anisotropic_data(spark):
    """Where the signal lives in LATE dims, the 16-dim raw prefix sees
    only noise while the trained 8-dim PCA front captures it — the
    reason pca_knn exists next to matryoshka_knn."""
    emb = _aniso_emb(spark)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_knn(emb, num_queries=8, k=5).collect()
    }

    got_pca = {
        (r.query_id, r.neighbor_id)
        for r in pca_knn(
            emb, num_queries=8, k=5, out_dim=8, shortlist=32
        ).collect()
    }
    got_mrl = {
        (r.query_id, r.neighbor_id)
        for r in matryoshka_knn(
            emb, num_queries=8, k=5, prefix_dim=16, shortlist=32
        ).collect()
    }
    r_pca = len(got_pca & truth) / len(truth)
    r_mrl = len(got_mrl & truth) / len(truth)
    assert r_pca >= 0.9, (r_pca, r_mrl)
    assert r_pca > r_mrl, (r_pca, r_mrl)


def test_pca_projection_is_map_side(spark):
    from example_kafkastreams_spark.plans import count_exchanges

    emb = load_table(spark, SMOKE, "embeddings")
    mean, comps = pca_train(emb, out_dim=8)
    assert count_exchanges(pca_project(emb, mean, comps)) == 0
