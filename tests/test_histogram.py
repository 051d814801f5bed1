"""Mergeable equi-width histogram sketch (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.sketches import (
    histogram_merge,
    histogram_quantile,
    histogram_sketch,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_histogram_layout_and_clamped_tails(spark):
    df = _vals(spark, [-5.0, 0.0, 0.5, 1.5, 9.99, 10.0, 42.0])
    got = {
        r.bucket: r.cnt
        for r in histogram_sketch(df, "v", 0.0, 10.0, 10).collect()
    }
    # -5 and 0.0 clamp into bucket 0; 10.0 and 42 clamp into bucket 9
    assert got == {0: 3, 1: 1, 9: 3}


def test_histogram_merge_equals_one_shot(spark):
    a = _vals(spark, range(0, 50))
    b = _vals(spark, range(30, 100))
    merged = sorted(map(tuple, histogram_merge(
        histogram_sketch(a, "v", 0.0, 100.0),
        histogram_sketch(b, "v", 0.0, 100.0),
    ).collect()))
    both = _vals(spark, list(range(0, 50)) + list(range(30, 100)))
    oneshot = sorted(map(tuple, histogram_sketch(
        both, "v", 0.0, 100.0
    ).collect()))
    assert merged == oneshot


def test_histogram_quantile_bounds_contain_truth(spark):
    xs = list(range(1000))
    rows = histogram_sketch(
        _vals(spark, xs), "v", 0.0, 1000.0
    ).collect()
    import statistics

    for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
        lo, hi = histogram_quantile(rows, q, 0.0, 1000.0)
        true = statistics.quantiles(xs, n=10**4)[
            min(int(q * 10**4), 10**4 - 2)
        ] if 0 < q < 1 else (min(xs) if q == 0 else max(xs))
        assert lo - 1e-9 <= true <= hi + 1e-9, (q, lo, true, hi)
        assert hi - lo == pytest.approx(1000.0 / 64)


def test_histogram_partition_invariant_and_bounded(spark):
    df = _vals(spark, range(5000))
    h1 = sorted(map(tuple, histogram_sketch(
        df, "v", 0.0, 5000.0
    ).collect()))
    h2 = sorted(map(tuple, histogram_sketch(
        df.repartition(17), "v", 0.0, 5000.0
    ).collect()))
    assert h1 == h2
    assert len(h1) <= 64


def test_histogram_rejects_bad_args(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        histogram_sketch(df, "v", 5.0, 5.0)
    rows = histogram_sketch(df, "v", 0.0, 10.0).collect()
    with pytest.raises(ValueError):
        histogram_quantile(rows, 1.5, 0.0, 10.0)
    with pytest.raises(ValueError):
        histogram_quantile([], 0.5, 0.0, 10.0)


def test_histogram_quantile_q0_skips_empty_leading_buckets():
    """ADVICE r9 regression: q=0 (the minimum) must return the first
    NON-EMPTY bucket's edges — with all mass in bucket 32 of [0,1000)
    x 64, the minimum is in [500, 515.625), never bucket 0."""
    from example_kafkastreams_spark.operators.sketches import (
        histogram_quantile,
    )

    rows = [{"bucket": 32, "cnt": 100}]
    lo_edge, hi_edge = histogram_quantile(rows, 0.0, 0.0, 1000.0, 64)
    assert (lo_edge, hi_edge) == (500.0, 515.625)
    # and the guarantee holds for every q over the same rows
    for q in (0.0, 0.5, 1.0):
        assert histogram_quantile(rows, q, 0.0, 1000.0, 64) == (
            500.0,
            515.625,
        )
