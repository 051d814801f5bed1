"""Corpus distribution drift (operators/diffs.corpus_drift_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.diffs import corpus_drift_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_identical_snapshots_zero_drift(spark):
    rows = [
        (i, f"s{i % 3}", "a b c " * (i % 7 + 1) + "end") for i in range(60)
    ]
    d = _docs(spark, rows)
    out = {r["source"]: r for r in corpus_drift_report(d, d).collect()}
    for src, r in out.items():
        assert r["tvd"] == 0.0 and r["l1_num"] == 0
        assert r["n_old"] == r["n_new"]


def test_disjoint_distributions_max_drift(spark):
    old = _docs(spark, [(i, "s", "w " * 3 + "w") for i in range(10)])
    new = _docs(spark, [(i, "s", "w " * 100 + "w") for i in range(10)])
    (r,) = corpus_drift_report(old, new).collect()
    assert r["tvd"] == 1.0  # no bucket overlap -> total variation 1


def test_matches_python_recomputation(spark):
    """Exact equality with a from-scratch Python TVD over the same
    bucketization."""
    import collections

    old_rows = [(i, f"s{i % 2}", "t " * (i % 30) + "t") for i in range(80)]
    new_rows = [
        (i, f"s{i % 2}", "t " * ((i * 3) % 40) + "t") for i in range(50)
    ]
    old, new = _docs(spark, old_rows), _docs(spark, new_rows)

    def hist(rows):
        h: dict = collections.defaultdict(
            lambda: collections.Counter()
        )
        for _, src, text in rows:
            n = len(text.split(" "))
            b = min(max(int((float(n) - 0.0) // 8.0), 0), 63)
            h[src][b] += 1
        return h

    ha, hb = hist(old_rows), hist(new_rows)
    got = {r["source"]: r for r in corpus_drift_report(old, new).collect()}
    for src in set(ha) | set(hb):
        na = sum(ha[src].values())
        nb = sum(hb[src].values())
        num = sum(
            abs(ha[src][b] * nb - hb[src][b] * na)
            for b in set(ha[src]) | set(hb[src])
        )
        r = got[src]
        assert (r["n_old"], r["n_new"], r["l1_num"]) == (na, nb, num)
        assert r["tvd"] == num / (2 * na * nb)


def test_one_sided_source_is_null_tvd(spark):
    old = _docs(spark, [(1, "gone", "a b c"), (2, "both", "a b")])
    new = _docs(spark, [(3, "both", "a b"), (4, "fresh", "x y z w")])
    got = {r["source"]: r for r in corpus_drift_report(old, new).collect()}
    assert got["gone"]["n_new"] == 0 and got["gone"]["tvd"] is None
    assert got["fresh"]["n_old"] == 0 and got["fresh"]["tvd"] is None
    assert got["both"]["tvd"] == 0.0


def test_custom_value_column(spark):
    """Drift over an arbitrary metric (chars instead of tokens)."""
    old = _docs(spark, [(i, "s", "abcd") for i in range(5)])
    new = _docs(spark, [(i, "s", "abcdefgh" * 4) for i in range(5)])
    (r,) = corpus_drift_report(
        old, new, value=F.length("text").cast("double")
    ).collect()
    assert r["tvd"] == 1.0
