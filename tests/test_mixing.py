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


def test_sql_rate_derivation_matches_python_bitexact():
    """q61's oracle re-derives the acceptance thresholds IN SQL (counts
    -> normalized-weight literals -> min cap -> rate -> floor(rate*2^32))
    instead of splicing Python-computed literals. That only works if
    DuckDB's double arithmetic reproduces mixture_rates bit-for-bit.
    Property-fuzz the claim: random weights and counts, compare the
    integer thresholds from both derivations exactly."""
    import random

    rng = random.Random(0xC0FFEE)
    M = 1 << 32
    for trial in range(200):
        n_src = rng.randint(1, 6)
        names = [f"s{i}" for i in range(n_src)]
        weights = {s: rng.uniform(0.01, 10.0) for s in names}
        counts = {s: rng.randint(1, 10**9) for s in names}
        rates = mixture_rates(counts, weights)
        py_thresholds = {s: int(r * M) for s, r in rates.items()}

        total = sum(weights.values())
        norm = {s: w / total for s, w in weights.items()}
        # STRING-cast literals (strtod, correctly rounded) — a bare
        # decimal literal goes through DuckDB's wide-DECIMAL->DOUBLE
        # conversion, which is 1 ULP off for ~8% of full-precision
        # doubles (the bug this test originally caught)
        values = ", ".join(
            f"('{s}', CAST({counts[s]} AS DOUBLE), CAST('{norm[s]!r}' AS DOUBLE))"
            for s in names
        )
        sql = f"""
        WITH normed(source, n, norm) AS (VALUES {values}),
        cap AS (SELECT min(n / norm) AS cap FROM normed)
        SELECT source,
               CAST(floor(((norm * (SELECT cap FROM cap)) / n) * {M}) AS BIGINT)
        FROM normed
        """
        duck_thresholds = dict(duckdb.sql(sql).fetchall())
        assert duck_thresholds == py_thresholds, (trial, weights, counts)


def test_temperature_rates_flatten_toward_rare_sources():
    """alpha=0.5 temperature mixing: the smallest source binds (rate
    1.0 within an ulp -> keeps everything), larger sources downsample
    to sqrt-proportional shares, and alpha=1.0 degrades to uniform
    rates (pure proportional mixing keeps relative shares)."""
    from example_kafkastreams_spark.operators.mixing import (
        temperature_rates,
    )

    counts = {"web": 90_000, "code": 10_000, "books": 2_500}
    rates = temperature_rates(counts, alpha=0.5)
    assert abs(rates["books"] - 1.0) < 1e-12  # binding: rarest source
    # expected kept rows n_s^0.5 * sqrt(n_books): shares flatten from
    # 36:4:1 to 6:2:1
    kept = {s: rates[s] * counts[s] for s in counts}
    assert round(kept["web"] / kept["books"]) == 6
    assert round(kept["code"] / kept["books"]) == 2
    # alpha=1: rate identical for every source (shape-preserving)
    r1 = temperature_rates(counts, alpha=1.0)
    assert len({round(v, 12) for v in r1.values()}) == 1
    # non-dyadic alpha is refused, not silently libm'd
    import pytest

    with pytest.raises(ValueError, match="dyadic"):
        temperature_rates(counts, alpha=0.3)


def test_temperature_binding_rate_is_exactly_one():
    """Non-perfect-square counts: (w*cap)/n for the binding source
    rounds one ulp below 1.0, whose floor(rate*2^32) threshold would
    drop the hash == 2^32-1 row — the clamp must return exactly 1.0
    (and for every source that TIES the min)."""
    from example_kafkastreams_spark.operators.mixing import (
        temperature_rates,
    )

    for n_small in (7, 11, 13, 999, 12345):
        rates = temperature_rates({"big": 10 * n_small, "rare": n_small})
        assert rates["rare"] == 1.0, n_small  # exactly, not within ulp
    tied = temperature_rates({"a": 7, "b": 7, "c": 700})
    assert tied["a"] == 1.0 and tied["b"] == 1.0


def test_temperature_mix_ignores_null_sources(spark):
    """A NULL source can never survive the equality filter, so it must
    not enter the rate derivation either — otherwise a small NULL
    group becomes a phantom binding source that down-samples every
    real source."""
    from example_kafkastreams_spark.operators.mixing import (
        mix_sources_temperature,
    )

    rows = [(i, "web") for i in range(400)] + [
        (1000 + i, None) for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = mix_sources_temperature(docs, 0.5).collect()
    # web is the only real source -> binding -> keeps ALL its rows;
    # with the phantom NULL group in the derivation its rate would
    # have been sqrt(4*400)/400 = 0.1
    assert sorted(r.doc_id for r in got) == list(range(400))


def test_temperature_mix_survivors_deterministic(spark):
    """The survivor set is a pure function of (id, source, counts):
    identical under repartitioning, and the rarest source keeps every
    row."""
    from example_kafkastreams_spark.operators.mixing import (
        mix_sources_temperature,
    )

    rows = (
        [(i, "web") for i in range(900)]
        + [(1000 + i, "code") for i in range(100)]
        + [(2000 + i, "books") for i in range(25)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(
        (r.doc_id, r.source)
        for r in mix_sources_temperature(docs, 0.5).collect()
    )
    b = sorted(
        (r.doc_id, r.source)
        for r in mix_sources_temperature(docs.repartition(13), 0.5).collect()
    )
    assert a == b
    kept_books = [x for x in a if x[1] == "books"]
    assert len(kept_books) == 25  # binding source survives whole
    # flattening really happened: web kept-share < code kept-share
    n_web = sum(1 for x in a if x[1] == "web")
    n_code = sum(1 for x in a if x[1] == "code")
    assert n_web / 900 < n_code / 100


def test_budget_quotas_waterfill_and_sum(spark):
    from example_kafkastreams_spark.operators.mixing import budget_quotas

    counts = {"a": 100, "b": 1000, "c": 10}
    # alpha=1: proportional, nobody pinned
    q = budget_quotas(counts, 500, alpha=1.0)
    assert sum(q.values()) == pytest.approx(500)
    assert q["b"] / q["a"] == pytest.approx(10.0)
    # alpha=0.5 flattens hard enough to over-allocate the small
    # sources: they pin at their counts, b absorbs the residual
    q2 = budget_quotas(counts, 500, alpha=0.5)
    assert q2["a"] == 100.0 and q2["c"] == 10.0
    assert q2["b"] == pytest.approx(390.0)
    # budget >= total: everything kept
    q3 = budget_quotas(counts, 10**6)
    assert q3 == {"a": 100.0, "b": 1000.0, "c": 10.0}
    with pytest.raises(ValueError):
        budget_quotas(counts, 0)
    with pytest.raises(ValueError):
        budget_quotas({}, 10)


def test_mix_sources_budget_token_weighted(spark):
    """weight_expr turns the budget into token units: per-source
    masses are weight sums, quotas water-fill in tokens, and the
    surviving token mass lands near the budget."""
    from example_kafkastreams_spark.operators.mixing import (
        mix_sources_budget,
    )

    docs = load_table(spark, SMOKE, "documents")
    w = "size(split(text, ' +'))"
    total_tokens = docs.filter(F.col("source").isNotNull()).agg(
        F.sum(F.expr(w))
    ).first()[0]
    budget = total_tokens // 2
    out = mix_sources_budget(docs, budget, alpha=0.5, weight_expr=w)
    kept_tokens = out.agg(F.sum(F.expr(w))).first()[0]
    # hash sampling over ~500 docs with ~50-token docs: allow a few
    # hundred tokens of noise around the target
    assert abs(kept_tokens - budget) < 0.1 * total_tokens, (
        kept_tokens, budget, total_tokens,
    )
    # deterministic
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mix_sources_budget(
            docs.repartition(11), budget, alpha=0.5, weight_expr=w
        ).collect()
    )
    assert a == b


def test_mix_sources_budget_end_to_end(spark):
    from example_kafkastreams_spark.operators.mixing import (
        budget_quotas,
        mix_sources_budget,
    )

    docs = load_table(spark, SMOKE, "documents")
    total = docs.filter(F.col("source").isNotNull()).count()
    budget = total // 2
    out = mix_sources_budget(docs, budget, alpha=0.5)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    counts = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("source").isNotNull())
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = budget_quotas(counts, budget, alpha=0.5)
    # pinned sources (rate 1.0) keep EVERY row exactly; sampled
    # sources land near their quota (hash-threshold sampling noise)
    for s, n in counts.items():
        if quotas[s] >= n:
            assert got.get(s, 0) == n, s
        else:
            assert abs(got.get(s, 0) - quotas[s]) <= 4 * (quotas[s] ** 0.5) + 3, (
                s, got.get(s, 0), quotas[s]
            )
    # total lands near the budget
    assert abs(sum(got.values()) - budget) <= 4 * (budget ** 0.5) + 5
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mix_sources_budget(
            docs.repartition(13), budget, alpha=0.5
        ).collect()
    )
    assert a == b
