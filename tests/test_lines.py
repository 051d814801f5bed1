"""Line-level corpus cleaning (operators.lines) — C4/RefinedWeb rules,
cross-doc boilerplate removal, deterministic document rebuild."""

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.lines import (
    boilerplate_lines,
    clean_documents,
    line_rule_predicate,
    split_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


COOKIE = "This site uses cookie consent banners"
NAV = "Home | About | Contact us today friends"


def test_split_lines_positions(spark):
    docs = _docs(spark, [(1, "alpha beta gamma\ndelta epsilon zeta", "a")])
    out = split_lines(docs).orderBy("line_idx").collect()
    assert [(r.line_idx, r.line) for r in out] == [
        (0, "alpha beta gamma"),
        (1, "delta epsilon zeta"),
    ]


def test_line_rules(spark):
    docs = _docs(
        spark,
        [
            (
                1,
                "one two three four\n"      # kept
                "too short\n"                # < 3 words
                "please enable JavaScript to continue\n"  # blocklist
                "Lorem Ipsum dolor sit amet\n"            # blocklist
                "   \n"                      # blank
                "five six seven eight nine",  # kept
                "a",
            )
        ],
    )
    kept = (
        split_lines(docs)
        .filter(line_rule_predicate(min_words=3))
        .orderBy("line_idx")
        .collect()
    )
    assert [r.line for r in kept] == [
        "one two three four",
        "five six seven eight nine",
    ]


def test_terminal_punctuation_rule(spark):
    docs = _docs(
        spark, [(1, "a full sentence here.\nno terminal punct here", "a")]
    )
    kept = (
        split_lines(docs)
        .filter(line_rule_predicate(require_terminal_punct=True))
        .collect()
    )
    assert [r.line for r in kept] == ["a full sentence here."]


def test_boilerplate_lines_cross_doc(spark):
    docs = _docs(
        spark,
        [
            (1, f"{COOKIE}\nunique content one here", "a"),
            (2, f"{COOKIE}\nunique content two here", "a"),
            (3, f"{COOKIE}\nunique content three here", "a"),
        ],
    )
    lines = split_lines(docs)
    bp = boilerplate_lines(lines, min_docs=3).collect()
    assert len(bp) == 1 and bp[0].n_docs == 3
    # repeated within ONE doc is not cross-doc boilerplate
    solo = _docs(spark, [(9, "same line again ok\nsame line again ok", "a")])
    assert boilerplate_lines(split_lines(solo), min_docs=2).count() == 0


def test_clean_documents_end_to_end(spark):
    docs = _docs(
        spark,
        [
            (1, f"{NAV}\nreal paragraph alpha beta gamma\n{COOKIE}", "s1"),
            (2, f"{NAV}\nreal paragraph delta epsilon zeta", "s2"),
            (3, f"{NAV}\n{COOKIE}", "s3"),  # nothing survives
        ],
    )
    out = clean_documents(
        docs, min_words=3, boilerplate_min_docs=2, min_lines=1,
        blocklist=("cookie",),
    )
    rows = {r.doc_id: r for r in out.collect()}
    # NAV appears in all 3 docs -> boilerplate; COOKIE blocklisted
    assert rows[1].text == "real paragraph alpha beta gamma"
    assert rows[2].text == "real paragraph delta epsilon zeta"
    assert 3 not in rows  # no surviving lines -> doc dropped
    assert rows[1].n_lines_kept == 1
    # passthrough columns preserved
    assert rows[1].src == "s1" and rows[2].src == "s2"
    assert out.columns == ["doc_id", "text", "src", "n_lines_kept"]


def test_clean_documents_rebuild_order_partition_independent(spark):
    body = "\n".join(f"line number {i} of the doc" for i in range(20))
    docs = _docs(spark, [(1, body, "a")])
    base = clean_documents(
        docs, boilerplate_min_docs=None
    ).collect()[0].text
    for k in (2, 7):
        got = clean_documents(
            docs.repartition(k), boilerplate_min_docs=None
        ).collect()[0].text
        assert got == base
    assert base == body  # all lines pass the rules -> exact rebuild


def test_clean_documents_idempotent(spark):
    docs = _docs(
        spark,
        [
            (1, f"{NAV}\ngood solid line of text here", "a"),
            (2, f"{NAV}\nanother good line of text", "a"),
        ],
    )
    once = clean_documents(docs, blocklist=())
    twice = clean_documents(
        once.select("doc_id", "text", "src"), blocklist=()
    )
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b


def test_boilerplate_shuffle_is_digest_only(spark):
    """The cross-doc count's exchange must carry md5 digests, not line
    text — same discipline as exact_text_dedup."""
    docs = _docs(spark, [(1, "a line of text here\nmore text", "a")])
    plan = (
        boilerplate_lines(split_lines(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ex = [l for l in plan.split("\n") if "Exchange" in l]
    assert ex, "expected the digest-keyed aggregation exchange"
    assert any("line_hash" in l for l in ex)
    assert all("line#" not in l for l in ex)  # raw text never shuffles


def test_line_clean_composes_into_funnel(spark):
    """corpus_stages(line_clean=...) runs the C4 line stage BEFORE
    document quality: boilerplate/blocklist lines vanish from every
    downstream stage's text, the funnel stays monotone, and the
    line_cleaned stage reports per-doc survivor counts."""
    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )
    from example_kafkastreams_spark.pipelines import corpus_stages

    rows = [
        (
            i,
            f"{NAV}\n"
            f"the quick brown fox number {i} jumps the lazy dog\n"
            f"this corpus line {i} carries enough words to clear",
            "en",
            "src0",
            0,
        )
        for i in range(6)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    stages = corpus_stages(
        docs,
        min_quality=0.0,
        line_clean={"min_words": 3, "boilerplate_min_docs": 2},
    )
    cleaned = {r.doc_id: r for r in stages["line_cleaned"].collect()}
    assert all(NAV not in r.text for r in cleaned.values())
    assert all(r.n_lines_kept == 2 for r in cleaned.values())
    # raw is the pre-clean input; downstream counts are monotone
    n = {k: stages[k].count() for k in
         ("raw", "quality", "language", "exact_dedup")}
    release_sketch_caches()
    assert n["raw"] == 6
    assert 6 >= n["quality"] >= n["language"] >= n["exact_dedup"] > 0
