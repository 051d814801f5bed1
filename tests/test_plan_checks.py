"""Plan-shape helpers must be execution-order independent.

Round-11 regression: once a memoized query's DataFrame has EXECUTED
(any earlier test running it first — e.g. the driver-sim sweep), its
explain string prints every executed AdaptiveSparkPlan (the root and
each materialized InMemoryRelation's cached plan) with BOTH a
``== Final Plan ==`` and an ``== Initial Plan ==`` section, so naive
regex counts over the raw text double-count exchanges/pushed filters
and plan pins start depending on test ORDER (q54 read 49 "exchanges"
instead of its pinned 15). ``_initial_plan`` drops every Final
section — indent-aware, because materialized cached relations nest
their own Final/Initial pairs inside the root's sections — leaving
exactly the text a never-executed plan prints.
"""

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.plans.checks import (
    _initial_plan,
    count_exchanges,
)
from tests.conftest import SMOKE


def test_count_exchanges_stable_across_execution(spark):
    # a plan with a persisted, shared agg stage — the memoized-build
    # shape: cached frame fans out, then the whole thing executes
    docs = load_table(spark, SMOKE, "documents")
    agg = docs.groupBy((F.col("doc_id") % 7).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    df = agg.unionByName(agg.filter(F.col("n") > 0))
    before = count_exchanges(df)
    assert before >= 1
    try:
        df.collect()  # materializes the cache AND the root adaptive plan
        assert count_exchanges(df) == before
    finally:
        agg.unpersist()


def test_initial_plan_strips_nested_final_sections():
    text = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "+- == Final Plan ==\n"
        "   Exchange hashpartitioning(a, 8)\n"
        "   +- InMemoryRelation\n"
        "      +- AdaptiveSparkPlan isFinalPlan=true\n"
        "         +- == Final Plan ==\n"
        "            Exchange hashpartitioning(b, 8)\n"
        "         +- == Initial Plan ==\n"
        "            Exchange hashpartitioning(b, 8)\n"
        "+- == Initial Plan ==\n"
        "   Exchange hashpartitioning(a, 8)\n"
        "   +- InMemoryRelation\n"
        "      +- AdaptiveSparkPlan isFinalPlan=true\n"
        "         +- == Final Plan ==\n"
        "            Exchange hashpartitioning(c, 8)\n"
        "         +- == Initial Plan ==\n"
        "            Exchange hashpartitioning(c, 8)\n"
    )
    kept = _initial_plan(text)
    # one exchange per DISTINCT initial print survives: the root's "a"
    # (its Final twin and the Final-nested "b" pair dropped wholesale)
    # and the initial-nested "c" (its own Final twin dropped)
    assert kept.count("Exchange hashpartitioning(a") == 1
    assert kept.count("Exchange hashpartitioning(b") == 0
    assert kept.count("Exchange hashpartitioning(c") == 1
    # untouched when no markers exist (the never-executed plan)
    plain = "Exchange hashpartitioning(x, 8)\n+- Scan parquet\n"
    assert _initial_plan(plain) == plain
