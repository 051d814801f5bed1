"""Hashing-trick linear classifier (operators/quality_clf.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.quality_clf import (
    score_inline,
    train_hashed_classifier,
    train_score_sql,
    weights_vector,
)


def _bucket(tok: str, n_buckets: int = 256) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _weight(c_pos: int, c_neg: int) -> int:
    import math

    return int(
        math.floor((c_pos + 1) / (c_pos + c_neg + 2) * 1_000_000)
    ) - 500_000


def test_train_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "good good prose", True),
            (2, "spam spam spam", False),
            (3, "good prose", True),
        ],
        "doc_id long, text string, pos boolean",
    )
    got = {
        r.bucket: r.w
        for r in train_hashed_classifier(docs, "pos").collect()
    }
    from collections import Counter

    cp, cn = Counter(), Counter()
    for _, text, pos in [
        (1, "good good prose", True),
        (2, "spam spam spam", False),
        (3, "good prose", True),
    ]:
        for t in text.split(" "):
            (cp if pos else cn)[_bucket(t)] += 1
    want = {
        b: _weight(cp[b], cn[b]) for b in set(cp) | set(cn)
    }
    assert got == want


def test_score_inline_matches_manual_sum(spark):
    docs = spark.createDataFrame(
        [(1, "good prose", True), (2, "spam spam", False)],
        "doc_id long, text string, pos boolean",
    )
    w = weights_vector(train_hashed_classifier(docs, "pos"))
    scored = {
        r.doc_id: (r.clf_score, r.clf_n_tokens, r.clf_keep)
        for r in score_inline(docs, w).collect()
    }
    s1 = w[_bucket("good")] + w[_bucket("prose")]
    s2 = 2 * w[_bucket("spam")]
    assert scored[1] == (s1, 2, s1 > 0)
    assert scored[2] == (s2, 2, s2 > 0)
    # positive-seed vocabulary scores positive, spam negative
    assert scored[1][2] and not scored[2][2]


def test_scoring_is_map_side_only(spark):
    """100 TB pin: the literal-weights scorer adds NO exchange — the
    classifier inlines into the scan projection."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.plans import count_exchanges
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").select("doc_id", "text")
    scored = score_inline(docs, [1] * 256)
    assert count_exchanges(scored) == 0


def test_training_output_bounded_by_buckets(spark):
    from example_kafkastreams_spark.catalog import load_table
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").withColumn(
        "pos", F.col("doc_id") % 2 == 0
    )
    weights = train_hashed_classifier(docs, "pos", n_buckets=64)
    assert weights.count() <= 64


def test_sql_twin_agrees_with_spark_path(spark):
    """The join-formulated SQL twin (what the driver runs in DuckDB)
    must reproduce the literal-array Spark path on the same data."""
    import duckdb

    from tests.conftest import SMOKE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SMOKE}/documents.parquet'"
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]), bool(r[3]))
        for r in con.execute(
            train_score_sql("n_chars >= 200")
        ).fetchall()
    }
    con.close()

    from example_kafkastreams_spark.catalog import load_table

    docs = load_table(spark, SMOKE, "documents")
    labeled = docs.withColumn("__pos", F.col("n_chars") >= 200)
    w = weights_vector(train_hashed_classifier(labeled, "__pos"))
    got = {
        r.doc_id: (r.clf_score, r.clf_n_tokens, r.clf_keep)
        for r in score_inline(
            docs.select("doc_id", "text"), w
        ).collect()
    }
    assert got == want


def test_calibration_bins_counts_and_clamp(spark):
    from example_kafkastreams_spark.operators.quality_clf import (
        CALIB_CLAMP,
        CALIB_WIDTH,
        calibration_bins,
    )

    rows = [
        # (score, pos): bin 0 holds scores 0..63, bin 1 holds 64..127,
        # extreme scores clamp to ±CALIB_CLAMP
        (10, True),
        (20, False),
        (70, True),
        (90, True),
        (-5000, False),
        (5000, True),
    ]
    df = spark.createDataFrame(
        [(i, p, s) for i, (s, p) in enumerate(rows)],
        "doc_id bigint, __pos boolean, clf_score bigint",
    )
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["sum_score"], r["pos_rate"])
        for r in calibration_bins(df).collect()
    }
    assert got[0] == (2, 1, 30, 0.5)
    assert got[1] == (2, 2, 160, 1.0)
    assert got[-CALIB_CLAMP] == (1, 0, -5000, 0.0)
    assert got[CALIB_CLAMP] == (1, 1, 5000, 1.0)
    assert CALIB_WIDTH == 64
    # partition invariance
    again = {
        r["bin"]: (r["n"], r["n_pos"], r["sum_score"], r["pos_rate"])
        for r in calibration_bins(df.repartition(5)).collect()
    }
    assert again == got
