"""LLM-pipeline extensions (q4x/q5x): oracle parity at sf0.001, the
SimHash pandas fast path pinned to the expression path, multimodal
decode plumbing, and plan-shape checks (broadcast KNN, JVM-side
sketches)."""

from __future__ import annotations

import pandas as pd
import pytest

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators import multimodal as MM
from example_kafkastreams_spark.operators import neardup as ND
from example_kafkastreams_spark.plans import explain_str
from example_kafkastreams_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SMOKE
from tests.oracle_utils import assert_matches_oracle

EXT = sorted(n for n in QUERIES if n.startswith(("q4", "q5")))


@pytest.mark.parametrize("name", EXT)
def test_oracle_parity(spark, name):
    assert name in ORACLE_SQL, f"{name} must declare oracle SQL"
    # rel_tol=0: the md5 sketches and left-fold double math are
    # engineered to be bitwise identical across engines.
    assert_matches_oracle(
        QUERIES[name](spark, SMOKE), ORACLE_SQL[name], SMOKE, rel_tol=0
    )


def test_simhash_pandas_matches_expression(spark):
    docs = load_table(spark, SMOKE, "documents").limit(50)
    expr_rows = {
        r.doc_id: r.simhash for r in ND.with_simhash(docs).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    ids = sorted(texts)
    fast = ND.simhash32_pandas(pd.Series([texts[i] for i in ids]))
    for i, doc_id in enumerate(ids):
        assert int(fast.iloc[i]) == expr_rows[doc_id], doc_id


def test_minhash_pairs_are_high_jaccard(spark):
    """Precision check: every LSH-confirmed pair really is ≥ threshold
    by exact shingle Jaccard (verified independently in q44)."""
    est = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q41_dedup_minhash_lsh"](spark, SMOKE).collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q44_dedup_ngram_jaccard"](spark, SMOKE).collect()
    }
    assert exact, "planted near-duplicates must be found"
    # est-threshold 0.5 pairs should essentially all confirm at 0.5 exact
    assert len(est & exact) >= len(est) * 0.8


def test_multimodal_payload_roundtrip(spark):
    docs = load_table(spark, SMOKE, "documents").limit(5)
    out = MM.decode_images(MM.attach_payload(docs)).collect()
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert len(out) == 5
    for r in out:
        b = raw[r.doc_id].encode()
        assert r.n_bytes == len(b)
        assert r.byte_sum == sum(b)  # bytes really crossed into Python
        assert r.width == 64 + len(b) % 577


def test_multimodal_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        list(MM.decode_image_batches_real(iter([])))


def test_knn_broadcasts_query_side(spark):
    plan = explain_str(QUERIES["q45_knn_bruteforce"](spark, SMOKE), "simple")
    assert "Broadcast" in plan  # corpus never shuffles for the join


def test_sketches_stay_jvm_side(spark):
    # No Python eval in the per-doc path: sketch queries must not plan
    # Batch/ArrowEvalPython nodes (q52 is the intentional exception).
    for name in ("q41_dedup_minhash_lsh", "q42_dedup_simhash", "q51_fingerprint"):
        plan = explain_str(QUERIES[name](spark, SMOKE), "simple")
        assert "EvalPython" not in plan, name


def test_lsh_beats_allpairs_comparisons(spark):
    """The LSH candidate count must be far below |docs|²/2 — the scale
    property the whole design rests on."""
    docs = load_table(spark, SMOKE, "documents")
    n = docs.count()
    cand = ND.minhash_lsh_pairs(docs, threshold=0.0).count()
    assert cand < (n * (n - 1) // 2) * 0.05, (cand, n)
