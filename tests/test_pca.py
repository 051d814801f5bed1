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


def test_pinned_basis_matches_provenance_recipe(spark):
    """pca_basis.PCA_MEAN/PCA_COMPS must be reproducible from the
    documented recipe (first 256 id-ordered sf0.01 embeddings,
    out_dim=8) — reprs round-trip the exact doubles, so equality is
    bitwise."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.pca_basis import PCA_COMPS, PCA_MEAN

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    mean, comps = pca_train(emb, out_dim=8, sample_n=256)
    assert mean == PCA_MEAN
    assert comps == PCA_COMPS


def test_pca_knn_shipped_basis_skips_training(spark):
    """basis= serves without a training collect and matches the
    explicitly two-stage project+rank derivation."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.pca_basis import PCA_COMPS, PCA_MEAN

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = sorted(
        map(
            tuple,
            pca_knn(
                emb, num_queries=4, k=3, shortlist=16,
                basis=(PCA_MEAN, PCA_COMPS),
            ).collect(),
        )
    )
    # independent derivation: project, then brute-rank the reduced
    # shortlist and refine full-dim with the same tiebreak
    proj = pca_project(emb, PCA_MEAN, PCA_COMPS)
    rows = proj.select("vec_id", "embedding", "reduced").collect()
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    want = []
    qs = [r for r in rows if r.vec_id < 4]
    for q in qs:
        cand = [r for r in rows if r.vec_id != q.vec_id]
        short = sorted(
            cand, key=lambda r: (-cos(q.reduced, r.reduced), r.vec_id)
        )[:16]
        ref = sorted(
            short, key=lambda r: (-cos(q.embedding, r.embedding), r.vec_id)
        )[:3]
        for rank, r in enumerate(ref, 1):
            want.append(
                (q.vec_id, r.vec_id,
                 round(cos(q.embedding, r.embedding), 6), rank)
            )
    assert got == sorted(want)
