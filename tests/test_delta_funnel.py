"""Day-2 funnel (corpus_stages_delta): the index-backed delta funnel
vs the one-shot funnel over corpus ∪ delta.

Two regimes, both pinned:
* bridge-free fixture → EXACT equality of admitted sets and chunks;
* real corpus (sf0.001 documents, which DOES contain delta docs that
  bridge previously-distinct clusters) → admission is append-only:
  the split run admits a SUPERSET of the one-shot survivors (both
  previously-admitted cluster reps remain; the bridging delta doc
  still drops), never loses one, and never admits a delta doc the
  one-shot would have dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.operators.neardup import (
    exact_text_dedup,
    simhash_band_index,
)
from example_kafkastreams_spark.pipelines import (
    corpus_stages,
    corpus_stages_delta,
)

SMOKE = "/root/testdata/sf0.001"

BASE = [
    "the quick brown fox jumps over the lazy dog near the old river bank",
    "a tall green tree stands alone on the wide open hill above the town",
    "many small boats sail across the calm blue sea under a bright sky",
]


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def _funnel_kw():
    # neutralize the quality/language gates so the fixture isolates the
    # dedup/admission equivalence (tiny synthetic texts score oddly)
    from example_kafkastreams_spark.functions import portable as P

    return dict(
        min_quality=-1.0, languages=tuple(P.LANG_MARKERS), scrub_pii=False
    )


def test_delta_funnel_equals_one_shot_bridge_free(spark):
    def variant(base, i):
        toks = base.split()
        toks[-1] = f"tok{i}"
        return " ".join(toks)

    corpus_rows = (
        [(1, BASE[0]), (2, BASE[0]), (3, BASE[1]), (4, BASE[2])]
    )
    # delta: exact copies of single corpus groups, a variant of ONE
    # group, internal dup structure, and genuinely new content — no
    # doc near two distinct corpus clusters (bridge-free)
    delta_rows = [
        (10, BASE[0]),
        (11, variant(BASE[0], 1)),
        (12, "completely new words about winter snow and ice falls today"),
        (13, "completely new words about winter snow and ice falls today"),
        (14, "another fully distinct document with its own singular text"),
    ]
    kw = _funnel_kw()
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")

    one = corpus_stages(corpus.unionByName(delta), **kw)
    want = _ids(one["neardup_survivors"])
    want_chunks = sorted(map(tuple, one["chunks"].collect()))

    day1 = corpus_stages(corpus, **kw)
    digest_idx = exact_text_dedup(day1["language"]).persist()
    band_idx = simhash_band_index(day1["exact_dedup"]).persist()
    d2 = corpus_stages_delta(delta, digest_idx, band_idx, **kw)

    got = _ids(day1["neardup_survivors"]) | _ids(d2["neardup_admitted"])
    assert got == want
    got_chunks = sorted(
        list(map(tuple, day1["chunks"].collect()))
        + list(map(tuple, d2["chunks"].collect()))
    )
    assert got_chunks == want_chunks
    # index layouts for the append rules
    assert set(d2["digest_index_delta"].columns) == {
        "doc_id", "content_hash", "n_copies"
    }
    assert set(d2["band_index_delta"].columns) == {
        "doc_id", "simhash", "band_idx", "band_val"
    }
    digest_idx.unpersist()
    band_idx.unpersist()


def test_delta_funnel_append_only_superset_on_real_corpus(spark):
    docs = load_table(spark, SMOKE, "documents")
    cut = docs.agg(F.expr("percentile(doc_id, 0.7)")).first()[0]
    corpus = docs.filter(F.col("doc_id") <= cut)
    delta = docs.filter(F.col("doc_id") > cut)

    one = corpus_stages(docs)
    want = _ids(one["neardup_survivors"])

    day1 = corpus_stages(corpus)
    digest_idx = exact_text_dedup(day1["language"]).persist()
    band_idx = simhash_band_index(day1["exact_dedup"]).persist()
    d2 = corpus_stages_delta(delta, digest_idx, band_idx)

    admitted_day1 = _ids(day1["neardup_survivors"])
    admitted_delta = _ids(d2["neardup_admitted"])
    got = admitted_day1 | admitted_delta
    # append-only: nothing the one-shot kept is lost...
    assert want <= got
    # ...and every EXTRA admitted doc is a day-1 survivor kept despite
    # a later bridge (never a delta doc the one-shot would drop)
    assert (got - want) <= admitted_day1
    # delta-side admissions agree exactly with the one-shot's delta side
    assert admitted_delta == {i for i in want if i > cut}
    digest_idx.unpersist()
    band_idx.unpersist()


def test_delta_funnel_bootstraps_without_indexes(spark):
    """Day 1 through the delta API (both indexes None) equals the
    one-shot funnel on the same docs."""
    docs = load_table(spark, SMOKE, "documents")
    one = corpus_stages(docs)
    boot = corpus_stages_delta(docs, None, None)
    assert _ids(boot["neardup_admitted"]) == _ids(one["neardup_survivors"])


def test_funnel_substr_stage(spark):
    """ExactSubstr as a funnel stage (VERDICT r6 item 4): with
    ``substr_k`` the cross-document repeated span is excised BEFORE
    quality (the Lee et al. placement), the stage output equals the
    standalone operator, funnel counts stay monotone, and the default
    path's stage dict is unchanged."""
    from example_kafkastreams_spark.operators.substr_dedup import (
        remove_repeated_substrings,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "first document begins right here " + span
            + " and then ends with its very own words"),
        (2, "second text has a totally other start " + span
            + " plus a unique ending of fresh tokens"),
        (3, "third standalone document with entirely distinct content"
            " words only and nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = _funnel_kw()
    stages = corpus_stages(docs, substr_k=8, **kw)
    assert "substr_cleaned" in stages
    want = {
        r.doc_id: r.text
        for r in remove_repeated_substrings(docs, k=8).collect()
    }
    got = {
        r.doc_id: r.text
        for r in stages["substr_cleaned"].select("doc_id", "text").collect()
    }
    assert got == want
    assert span not in got[1] and span not in got[2]
    n = {
        s: stages[s].count()
        for s in (
            "raw", "quality", "language", "exact_dedup",
            "neardup_survivors",
        )
    }
    assert (
        n["raw"] >= n["quality"] >= n["language"]
        >= n["exact_dedup"] >= n["neardup_survivors"]
    )
    assert "substr_cleaned" not in corpus_stages(docs, **kw)


def test_delta_funnel_substr_incremental(spark):
    """Day-2 ExactSubstr: a delta span present ONCE in the window-hash
    index is excised (the incremental rule), the index delta holds
    only NEW window hashes, and the default path has no substr
    entries."""
    from example_kafkastreams_spark.operators.substr_dedup import (
        window_hash_index,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, "corpus document text leading up to " + span
             + " and closing words of day one record")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (10, "fresh delta document reusing " + span
                 + " inside otherwise brand new material today"),
            (11, "wholly novel delta text with not one borrowed"
                 " window of any previously ingested content"),
        ],
        "doc_id long, text string",
    )
    kw = _funnel_kw()
    widx = window_hash_index(corpus, k=8).persist()
    d2 = corpus_stages_delta(
        delta, None, None, substr_k=8, whash_index=widx, **kw
    )
    assert "substr_cleaned" in d2 and "whash_index_delta" in d2
    texts = {
        r.doc_id: r.text
        for r in d2["substr_cleaned"].select("doc_id", "text").collect()
    }
    assert span not in texts[10]
    assert "wholly novel delta text" in texts[11]
    # index delta: only hashes the corpus index does not already hold
    new_h = {r.whash for r in d2["whash_index_delta"].collect()}
    old_h = {r.whash for r in widx.collect()}
    assert new_h and not (new_h & old_h)
    widx.unpersist()
    assert "substr_cleaned" not in corpus_stages_delta(
        delta, None, None, **kw
    )
