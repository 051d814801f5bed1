"""Snapshot diff semantics + plan shape (operators/diffs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.diffs import (
    snapshot_diff,
    snapshot_diff_counts,
)


def test_snapshot_diff_statuses(spark):
    a = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "k long, text string"
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "born")], "k long, text string"
    )
    diff = snapshot_diff(a, b, "k", ["text"])
    got = {r.k: r.status for r in diff.collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    counts = {r.status: r.n for r in snapshot_diff_counts(diff).collect()}
    assert counts == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_multi_column_digest(spark):
    # unit-separator join: ("ab","c") must NOT collide with ("a","bc")
    a = spark.createDataFrame([(1, "ab", "c")], "k long, x string, y string")
    b = spark.createDataFrame([(1, "a", "bc")], "k long, x string, y string")
    diff = snapshot_diff(a, b, "k", ["x", "y"])
    assert diff.collect()[0].status == "changed"


def test_snapshot_diff_shuffles_digests_not_text(spark):
    """100 TB shape: the full-outer join's exchanges carry (key,
    digest) only — the text column must be projected away BELOW both
    exchanges."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.plans import explain_str
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").select("doc_id", "text")
    diff = snapshot_diff(
        docs, docs.filter(F.col("doc_id") % 2 == 0), "doc_id", ["text"]
    )
    plan = explain_str(diff, "formatted")
    for line in plan.splitlines():
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in line, line
    # every exchange's input schema is the 2-column (key, digest) pair
    import re

    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[(\d+)\]: \[([^\]]*)\]", plan
    ):
        assert "text#" not in m.group(2), m.group(0)
