"""Domain mixing: deterministic hash resampling to target source
weights — achieved mixture near target, binding source kept whole,
exact survivor set agrees with the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators.mixing import (
    mix_sources,
    mix_sources_sql,
    mixture_rates,
)
from tests.conftest import ORACLE, SMOKE

WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def _source_counts(spark, sf):
    docs = load_table(spark, sf, "documents")
    return {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_rates_hit_target_at_binding_source():
    rates = mixture_rates({"src0": 800, "src1": 150, "src2": 50}, WEIGHTS)
    # src2 is binding (50/0.2 = 250 < 150/0.3 < 800/0.5): kept whole
    assert rates["src2"] == pytest.approx(1.0)
    assert 0 < rates["src1"] < 1 and 0 < rates["src0"] < 1
    kept = {s: r * n for (s, r), n in zip(rates.items(), (800, 150, 50))}
    total = sum(kept.values())
    for s, w in WEIGHTS.items():
        assert kept[s] / total == pytest.approx(w, rel=1e-9)


def test_mix_is_deterministic_and_near_target(spark):
    docs = load_table(spark, ORACLE, "documents")
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    weights = {s: 1.0 / len(srcs) for s in srcs}  # equalize
    mixed = mix_sources(docs, weights)
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(got.values())
    for s in srcs:  # hash sampling: ±20% of target share at sf0.01
        assert got[s] / total == pytest.approx(1.0 / len(srcs), rel=0.2)
    again = mix_sources(docs, weights).groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    assert {r["source"]: r["n"] for r in again} == got


def test_exact_survivor_set_matches_duckdb(spark):
    docs = load_table(spark, SMOKE, "documents")
    counts = {s: n for s, n in _source_counts(spark, SMOKE).items() if s in WEIGHTS}
    have = {s: w for s, w in WEIGHTS.items() if s in counts}
    if len(have) < 2:
        pytest.skip("corpus lacks the weighted sources")
    got = sorted(
        r[0] for r in mix_sources(docs, have).select("doc_id").collect()
    )
    where = mix_sources_sql(counts, have)
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SMOKE}/documents.parquet' WHERE {where}"
        ).fetchall()
    )
    assert got == want and got
