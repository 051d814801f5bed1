"""AMS tug-of-war F2 sketch (operators/sketches.py ams_f2_*)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.sketches import (
    AMS_DEPTH,
    ams_f2_counters,
    ams_f2_estimate,
    ams_f2_exact,
)

VALUES = (
    ["alpha"] * 5 + ["beta"] * 3 + ["gamma"] * 2 + ["delta", "epsilon"]
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_counters(values, depth):
    out = {}
    for d in range(depth):
        c = 0
        for v in values:
            c += 1 - 2 * (_h32(f"{d}:ams:{v}") % 2)
        out[d] = c
    return out


def _vals_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def test_counters_match_pure_python(spark):
    got = {
        r["d"]: r["counter"]
        for r in ams_f2_counters(_vals_df(spark, VALUES)).collect()
    }
    assert got == _py_counters(VALUES, AMS_DEPTH)


def test_mergeable_by_addition(spark):
    half_a, half_b = VALUES[:6], VALUES[6:]
    full = {
        r["d"]: r["counter"]
        for r in ams_f2_counters(_vals_df(spark, VALUES)).collect()
    }
    a = {
        r["d"]: r["counter"]
        for r in ams_f2_counters(_vals_df(spark, half_a)).collect()
    }
    b = {
        r["d"]: r["counter"]
        for r in ams_f2_counters(_vals_df(spark, half_b)).collect()
    }
    assert full == {d: a[d] + b[d] for d in a}


def test_partition_invariance(spark):
    df = _vals_df(spark, VALUES)
    base = sorted(map(tuple, ams_f2_counters(df).collect()))
    shuffled = sorted(
        map(tuple, ams_f2_counters(df.repartition(5)).collect())
    )
    assert base == shuffled


def test_exact_f2(spark):
    row = ams_f2_exact(_vals_df(spark, VALUES)).first()
    assert row["exact_f2"] == 5 * 5 + 3 * 3 + 2 * 2 + 1 + 1


def test_estimate_is_middle_counter_square(spark):
    cdf = ams_f2_counters(_vals_df(spark, VALUES))
    est = ams_f2_estimate(cdf).first()["est_f2"]
    squares = sorted(
        r["counter"] ** 2 for r in cdf.collect()
    )
    assert AMS_DEPTH % 2 == 1
    assert est == float(squares[AMS_DEPTH // 2])


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(v,) for v in VALUES] + [(None,)], "v string"
    )
    with_null = {
        r["d"]: r["counter"] for r in ams_f2_counters(df).collect()
    }
    assert with_null == _py_counters(VALUES, AMS_DEPTH)
