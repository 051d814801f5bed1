"""Relational breadth: every declared q1x/q2x query matches its DuckDB
oracle at sf0.001, plus physical-plan shape assertions (pushdown,
broadcast, top-k)."""

from __future__ import annotations

import pytest

from example_kafkastreams_spark.plans import count_exchanges, explain_str, pushed_filters
from example_kafkastreams_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SMOKE
from tests.oracle_utils import assert_matches_oracle

RELATIONAL = sorted(n for n in QUERIES if n.startswith(("q1", "q2", "q3")))


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, name):
    assert name in ORACLE_SQL, f"{name} must declare oracle SQL"
    assert_matches_oracle(QUERIES[name](spark, SMOKE), ORACLE_SQL[name], SMOKE)


def test_q10_pushdown_reaches_scan(spark):
    df = QUERIES["q10_filter_project"](spark, SMOKE)
    pushed = pushed_filters(df)
    assert any("l_discount" in p or "l_quantity" in p for p in pushed), pushed
    plan = explain_str(df, "formatted")
    # pruned read schema: only the 5 referenced columns, not all 11
    assert "l_returnflag" not in plan


def test_q16_broadcasts_dim(spark):
    plan = explain_str(QUERIES["q16_join_broadcast_parts"](spark, SMOKE), "simple")
    assert "BroadcastHashJoin" in plan


def test_q17_is_take_ordered(spark):
    plan = explain_str(QUERIES["q17_topk_orders"](spark, SMOKE), "simple")
    assert "TakeOrderedAndProject" in plan


def test_q12_single_agg_exchange(spark):
    # dims broadcast => shuffles only for the orders⋈customer join + agg
    df = QUERIES["q12_join_multiway"](spark, SMOKE)
    assert count_exchanges(df) <= 3


def test_q26_joins_on_bucket_equikey(spark):
    """q26 must run through the bucketized interval join: the time
    bucket rides as an equi-key (hash join on user_id + __bucket), not
    a raw key-only join with a time post-filter that goes quadratic on
    hot keys."""
    df = QUERIES["q26_interval_join_symmetric"](spark, SMOKE)
    plan = explain_str(df, "simple")
    assert "__bucket" in plan, plan
    # the bucket key must be part of the hash-join keys, not only a filter
    join_lines = [
        ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert any("__bucket" in ln for ln in join_lines), join_lines


def test_flagship_beats_naive_rekeyed_plan(spark):
    """The translated 10x claim (BASELINE.md): the co-partitioned
    declarative flagship must plan strictly fewer exchanges than the
    reference-DSL-style version with a repartition per selectKey."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.enrich import (
        enrich_clickstream,
        enrich_clickstream_naive,
    )

    events = load_table(spark, SMOKE, "events")
    opt = count_exchanges(enrich_clickstream(events))
    naive = count_exchanges(enrich_clickstream_naive(events))
    assert opt < naive, (opt, naive)
