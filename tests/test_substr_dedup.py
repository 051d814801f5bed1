"""Exact substring (repeated-span) dedup units."""

from __future__ import annotations

from example_kafkastreams_spark.operators.substr_dedup import (
    remove_repeated_substrings,
    repeated_spans,
)

K = 4

# a 6-token run shared by docs 1 and 2, embedded in distinct text;
# doc 3 repeats a run WITHIN itself; doc 4 is clean and short
SHARED = "alpha beta gamma delta epsilon zeta"
DOCS = [
    (1, f"one two three {SHARED} four five six"),
    (2, f"seven eight {SHARED} nine ten"),
    (3, "p q r s p q r s x y"),
    (4, "just a few words"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repeated_spans_exact_boundaries(spark):
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in repeated_spans(_df(spark), k=K).collect()
    }
    # doc 1: SHARED occupies tokens 4..9; windows of 4 flag 4..9 merged
    assert spans[1] == (4, 9)
    # doc 2: SHARED occupies tokens 3..8
    assert spans[2] == (3, 8)
    # doc 3: "p q r s" at 1..4 and 5..8 -> windows 1..5 all repeat
    # ("q r s p" at 2 matches... positions 1 and 5 share content; the
    # merged span covers 1..8)
    assert spans[3] == (1, 8)
    assert 4 not in spans


def test_remove_repeated_substrings_rebuild(spark):
    got = {
        r.doc_id: r.text
        for r in remove_repeated_substrings(_df(spark), k=K).collect()
    }
    assert got[1] == "one two three four five six"
    assert got[2] == "seven eight nine ten"
    assert got[3] == "x y"
    assert got[4] == "just a few words"  # untouched, columns preserved


def test_short_docs_never_flagged(spark):
    docs = _df(spark).sparkSession.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    # identical but shorter than k: no k-window exists, nothing flagged
    assert repeated_spans(docs, k=4).count() == 0
    got = {r.doc_id: r.text for r in
           remove_repeated_substrings(docs, k=4).collect()}
    assert got == {1: "a b", 2: "a b"}


def test_spans_are_shuffle_light(spark):
    """The window table's exchange carries (id, start, hash) — the
    text never leaves the scan: no text column below the first
    exchange in the plan."""
    from example_kafkastreams_spark.plans import explain_str

    plan = explain_str(repeated_spans(_df(spark), k=K), "formatted")
    # the aggregate keys on whash; text appears only in scan/project
    assert "md5" in plan or "whash" in plan


# --- property tests (small alphabet forces repeats) ----------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_TOK = st.sampled_from(["a", "b", "c"])
_PDOC = st.lists(_TOK, min_size=1, max_size=14).map(" ".join)
_PDOCS = st.lists(_PDOC, min_size=1, max_size=5)
_PSET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_spans(docs, k):
    """Reference implementation: brute-force window counting + merge."""
    from collections import Counter

    wins = {}
    counts = Counter()
    for i, text in docs:
        toks = text.split(" ")
        ws = [
            (s + 1, " ".join(toks[s:s + k]))
            for s in range(len(toks) - k + 1)
        ]
        wins[i] = ws
        counts.update(w for _, w in ws)
    spans = {}
    for i, ws in wins.items():
        flagged = [s for s, w in ws if counts[w] >= 2]
        merged = []
        for s in flagged:
            if merged and s <= merged[-1][1] - k + 1 + k:  # s <= prev_start + k
                merged[-1] = (merged[-1][0], max(merged[-1][1], s + k - 1))
            else:
                merged.append((s, s + k - 1))
        if merged:
            spans[i] = merged
    return spans


@_PSET
@given(docs=_PDOCS)
def test_spans_match_reference_implementation(spark, docs):
    k = 3
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in repeated_spans(df, k=k).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == _py_spans(rows, k)


@_PSET
@given(docs=_PDOCS)
def test_rebuild_is_subsequence_with_exact_coverage(spark, docs):
    """Rebuilt text = original tokens minus exactly the span-covered
    positions (so it is a subsequence, and removal is position-exact)."""
    k = 3
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = _py_spans(rows, k)
    got = {
        r.doc_id: r.text
        for r in remove_repeated_substrings(df, k=k).collect()
    }
    for i, text in rows:
        toks = text.split(" ")
        covered = set()
        for s, e in spans.get(i, []):
            covered.update(range(s, e + 1))
        want = " ".join(
            t for p, t in enumerate(toks, start=1) if p not in covered
        )
        assert got[i] == want


def test_incremental_spans_match_one_shot_delta_side(spark):
    """incremental_repeated_spans against the corpus's window-hash
    index must produce EXACTLY the delta restriction of the one-shot
    span table over corpus ∪ delta (the delta-side decision rule is
    identical: >=2 within delta OR present in the corpus)."""
    from example_kafkastreams_spark.operators.substr_dedup import (
        incremental_repeated_spans,
        window_hash_index,
    )

    corpus_rows = [
        (1, f"one two three {SHARED} four five six"),
        (2, "seven eight nine ten eleven twelve"),
    ]
    delta_rows = [
        (10, f"intro words {SHARED} outro words here"),  # hits the index
        (11, "p q r s p q r s x y"),                     # within-delta
        (12, "totally novel tokens with no repeats at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")

    one_shot = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(
            corpus.unionByName(delta), k=K
        ).collect()
        if r.doc_id >= 10
    }
    idx = window_hash_index(corpus, k=K).persist()
    spans, index_delta = incremental_repeated_spans(delta, idx, k=K)
    got = {
        (r.doc_id, r.span_start, r.span_end) for r in spans.collect()
    }
    assert got == one_shot and got  # non-empty: both regimes hit

    # index update: idx' = idx ∪ delta's NEW hashes, no duplicates
    n_idx = idx.count()
    n_new = index_delta.count()
    n_union = (
        idx.unionByName(index_delta).select("whash").distinct().count()
    )
    assert n_union == n_idx + n_new
    whole = window_hash_index(
        corpus.unionByName(delta), k=K
    ).count()
    assert n_union == whole
    idx.unpersist()


def test_incremental_spans_bootstrap_equals_one_shot(spark):
    from example_kafkastreams_spark.operators.substr_dedup import (
        incremental_repeated_spans,
    )

    df = _df(spark)
    spans, index_delta = incremental_repeated_spans(df, None, k=K)
    assert sorted(map(tuple, spans.collect())) == sorted(
        map(tuple, repeated_spans(df, k=K).collect())
    )
    assert index_delta.count() == index_delta.select("whash").distinct().count()


def test_chunk_loss_masks(spark):
    """Span→chunk translation: a span inside one chunk masks its local
    range; a span crossing a chunk boundary masks the clamped tail and
    head of both chunks (overlap region included in each); chunks with
    no overlapping span emit nothing."""
    from pyspark.sql import functions as F  # noqa: F401

    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
        chunk_loss_masks,
    )

    # 40 tokens -> chunks at starts 1, 11, 21, 31 (size 16, stride 10)
    text = " ".join(f"t{i}" for i in range(1, 41))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_size=16, stride=10)
    # spans (global 1-based inclusive): [5,8] inside chunk 1;
    # [14,22] crosses chunks 1(1-16), 2(11-26), 3(21-36)
    spans = spark.createDataFrame(
        [(1, 5, 8), (1, 14, 22)],
        "doc_id long, span_start int, span_end int",
    )
    got = {
        (r.chunk_idx, r.mask_start, r.mask_end)
        for r in chunk_loss_masks(chunks, spans, stride=10).collect()
    }
    assert got == {
        (1, 5, 8),     # [5,8] local to chunk 1 (start 1)
        (1, 14, 16),   # [14,22] clamped to chunk 1's end
        (2, 4, 12),    # [14,22] shifted by chunk 2's start 11
        (3, 1, 2),     # [21,22] head of chunk 3 (start 21)
    }
    # mask lengths sum exactly (spans disjoint per doc): 4 + 3 + 9 + 2
    total = sum(e - s + 1 for _, s, e in got)
    assert total == 18
