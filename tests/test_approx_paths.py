"""The documented 100 TB scale paths for cardinality and quantiles are
the approximate sketches (HLL / t-digest). They cannot be oracle-checked
bit-for-bit across engines, so these tests pin them against the exact
answers with the accuracy the sketches guarantee — the honest check for
an approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from tests.conftest import ORACLE


def test_approx_count_distinct_within_rsd(spark):
    orders = load_table(spark, ORACLE, "orders")
    exact, approx = orders.agg(
        F.countDistinct("o_custkey"),
        F.approx_count_distinct("o_custkey", rsd=0.02),
    ).first()
    assert abs(approx - exact) <= 0.06 * exact  # 3 sigma of rsd=0.02


def test_approx_percentile_brackets_exact(spark):
    orders = load_table(spark, ORACLE, "orders")
    exact, approx = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)"),
    ).first()
    # accuracy 10000 => rank error <= n/10000; values are dense enough
    # that 1% relative value error is a conservative bound here
    assert abs(approx - exact) <= 0.01 * exact
