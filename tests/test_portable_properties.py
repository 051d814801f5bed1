"""Property-based cross-dialect agreement for functions.portable.

The whole oracle story rests on the dual-dialect builders producing
bit-identical results in Spark and DuckDB. The corpus tests exercise
the fixed testdata; these properties feed RANDOM documents (including
degenerate ones: single tokens, repeated tokens, docs too short to
shingle) through both engines and require exact equality.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from example_kafkastreams_spark.functions import portable as P

TOKEN = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
DOC = st.lists(TOKEN, min_size=1, max_size=25).map(" ".join)
DOCS = st.lists(DOC, min_size=1, max_size=8)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def both_engines(spark, docs: list[str], spark_expr: str, duck_expr: str):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    got = [
        r.out
        for r in sdf.selectExpr(f"{spark_expr} AS out", "doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {duck_expr} AS out FROM documents ORDER BY doc_id"
            ).fetchall()
        ]
    finally:
        con.close()
    return got, want


@SETTINGS
@given(docs=DOCS)
def test_fingerprint_agrees(spark, docs):
    got, want = both_engines(
        spark,
        docs,
        P.rolling_fingerprint("text", P.SPARK),
        P.rolling_fingerprint("text", P.DUCK),
    )
    assert got == want


@SETTINGS
@given(docs=DOCS)
def test_simhash_agrees(spark, docs):
    got, want = both_engines(
        spark,
        docs,
        P.simhash_from_hashes(P.token_hash_array("text", P.SPARK), P.SPARK),
        P.simhash_from_hashes(P.token_hash_array("text", P.DUCK), P.DUCK),
    )
    assert got == want


@SETTINGS
@given(docs=DOCS)
def test_minhash_signature_agrees(spark, docs):
    # includes docs with < 3 tokens: empty shingle sets ⇒ NULL minhash
    # components, which must be NULL in BOTH engines
    sig_s = P.minhash_sig(
        P.base_hash_array(P.shingles("text", 3, P.SPARK), P.SPARK), 4, P.SPARK
    )
    sig_d = P.minhash_sig(
        P.base_hash_array(P.shingles("text", 3, P.DUCK), P.DUCK), 4, P.DUCK
    )
    got, want = both_engines(spark, docs, sig_s, sig_d)
    assert got == want


@SETTINGS
@given(docs=DOCS)
def test_quality_arithmetic_agrees(spark, docs):
    toks_s, toks_d = P.split_ws("text", P.SPARK), P.split_ws("text", P.DUCK)
    expr_s = P.round_dbl(
        f"CAST({P.size_(P.distinct_(toks_s, P.SPARK), P.SPARK)} AS DOUBLE)"
        f" / {P.size_(toks_s, P.SPARK)}", 6, P.SPARK,
    )
    expr_d = P.round_dbl(
        f"CAST({P.size_(P.distinct_(toks_d, P.DUCK), P.DUCK)} AS DOUBLE)"
        f" / {P.size_(toks_d, P.DUCK)}", 6, P.DUCK,
    )
    got, want = both_engines(spark, docs, expr_s, expr_d)
    assert got == want


@SETTINGS
@given(docs=DOCS)
def test_token_hash32_agrees(spark, docs):
    """The two dialect forms (Spark conv() vs DuckDB nibble unroll)
    must produce the same BIGINT for arbitrary tokens."""
    got, want = both_engines(
        spark,
        docs,
        P.transform_(P.split_ws("text", P.SPARK), "t",
                     P.token_hash32("t", P.SPARK), P.SPARK),
        P.transform_(P.split_ws("text", P.DUCK), "t",
                     P.token_hash32("t", P.DUCK), P.DUCK),
    )
    assert got == want


@SETTINGS
@given(docs=DOCS)
def test_hll_bucket_rho_agree(spark, docs):
    """The HLL register coordinates — (hash mod m, trailing-zero CASE
    ladder over hash div m) — must agree bit-for-bit across dialects
    for arbitrary tokens; the q58 hll branches' oracle rests on it."""
    from example_kafkastreams_spark.operators.sketches import (
        _hll_register_exprs,
    )

    for p in (4, 8):
        exprs = {}
        for d in (P.SPARK, P.DUCK):
            bucket, rho = _hll_register_exprs("t", p, d)
            exprs[d] = P.transform_(
                P.split_ws("text", d), "t",
                f"CAST({bucket} AS BIGINT) * 100 + CAST({rho} AS BIGINT)",
                d,
            )
        got, want = both_engines(spark, docs, exprs[P.SPARK], exprs[P.DUCK])
        assert got == want, f"p={p}"


@SETTINGS
@given(docs=DOCS)
def test_dyadic_pow_agrees(spark, docs):
    """x^alpha via sqrt chains must agree bit-for-bit across Spark,
    DuckDB, AND the Python twin for arbitrary doc-length inputs and
    every dyadic alpha the mixing rates use."""
    import math

    from example_kafkastreams_spark.functions.portable import (
        dyadic_pow,
        dyadic_pow_py,
    )

    for alpha in (0.25, 0.5, 0.625, 0.75, 1.0):
        x_s = f"CAST({P.size_(P.split_ws('text', P.SPARK), P.SPARK)}"\
              " AS DOUBLE)"
        x_d = f"CAST({P.size_(P.split_ws('text', P.DUCK), P.DUCK)}"\
              " AS DOUBLE)"
        got, want = both_engines(
            spark,
            docs,
            dyadic_pow(x_s, alpha, P.SPARK),
            dyadic_pow(x_d, alpha, P.DUCK),
        )
        assert got == want, alpha
        py = [dyadic_pow_py(float(len(d.split(" "))), alpha) for d in docs]
        assert got == py, alpha
        if alpha == 0.5:
            assert got == [
                math.sqrt(float(len(d.split(" ")))) for d in docs
            ]


@SETTINGS
@given(docs=DOCS, stride=st.integers(min_value=1, max_value=7))
def test_seq_step_and_idiv_agree(spark, docs, stride):
    """Chunk-start offsets (stepped sequence) and chunk indices
    (integer division) agree across dialects for arbitrary doc lengths
    and strides — the q54 chunking skeleton."""
    n_s = P.size_(P.split_ws("text", P.SPARK), P.SPARK)
    n_d = P.size_(P.split_ws("text", P.DUCK), P.DUCK)
    expr_s = P.transform_(
        P.seq_step("1", n_s, stride, P.SPARK), "s",
        P.idiv("s - 1", str(stride), P.SPARK), P.SPARK,
    )
    expr_d = P.transform_(
        P.seq_step("1", n_d, stride, P.DUCK), "s",
        P.idiv("s - 1", str(stride), P.DUCK), P.DUCK,
    )
    got, want = both_engines(spark, docs, expr_s, expr_d)
    assert got == want


PII_FRAGMENT = st.one_of(
    TOKEN,
    st.just("bob.smith+x@corp-mail.example.com"),
    st.just("10.0.255.1"),
    st.just("+1 (650) 555-0199"),
    st.just("4111111111111111"),
    st.just("id 123456789 end"),
    st.just("a@b.cd"),
    st.just("1.2.3"),       # not an IP (3 octets) — must survive
    st.just("12345"),       # below the digit-run threshold
)
PII_DOC = st.lists(PII_FRAGMENT, min_size=1, max_size=12).map(" ".join)


@SETTINGS
@given(docs=st.lists(PII_DOC, min_size=1, max_size=6))
def test_pii_scrub_agrees(spark, docs):
    got, want = both_engines(
        spark, docs, P.pii_scrub("text", P.SPARK), P.pii_scrub("text", P.DUCK)
    )
    assert got == want
    for out in got:
        assert "@" not in out
        assert not any(tok.isdigit() and len(tok) >= 6 for tok in out.split())


@SETTINGS
@given(docs=st.lists(PII_DOC, min_size=1, max_size=6))
def test_pii_count_agrees(spark, docs):
    got, want = both_engines(
        spark, docs, P.pii_count("text", P.SPARK), P.pii_count("text", P.DUCK)
    )
    assert got == want


# normalize_text operates on RAW text (not tokenized docs): the fuzz
# alphabet deliberately mixes ASCII, the mojibake trigger bytes
# (â € œ Ã © ¼ ...), combining marks, C0/C1 controls, CR/LF, tabs and
# runs of spaces — every class the chain rewrites — plus plain
# passthrough unicode.
RAW_CHARS = st.sampled_from(
    list("abc XY09.,!?")
    + list("â€™œ“”–—¦¥Ã©¨¼±ñé")
    + ["́", "̀", "̈", "̃"]
    + ["\x00", "\x01", "\x08", "\x0b", "\x1f", "\x7f"]
    + ["\r", "\n", "\t", " ", "  "]
)
RAW_DOC = st.lists(RAW_CHARS, min_size=0, max_size=60).map("".join)
RAW_DOCS = st.lists(RAW_DOC, min_size=1, max_size=8)


@SETTINGS
@given(docs=RAW_DOCS)
@example(docs=["Ã\x00©"])  # C0 byte INSIDE a mojibake pair: the strip
# joins it into 'Ã©', which must repair in the SAME pass (the
# round-10 idempotence fix — control strip now runs first)
def test_normalize_text_agrees(spark, docs):
    got, want = both_engines(
        spark,
        docs,
        P.normalize_text("text", P.SPARK),
        P.normalize_text("text", P.DUCK),
    )
    assert got == want
    # idempotence: normalizing normalized text is the identity (the
    # fix-point-safe ordering claim)
    got2, want2 = both_engines(
        spark,
        got,
        P.normalize_text("text", P.SPARK),
        P.normalize_text("text", P.DUCK),
    )
    assert got2 == got and want2 == want


@SETTINGS
@given(docs=DOCS)
def test_bloom_position_agrees(spark, docs):
    """The Bloom bit-position expression (hash i salt + mod) must give
    identical positions in both dialects — the register AND probe
    twins both ride on it."""
    from example_kafkastreams_spark.operators.sketches import _bloom_pos

    got, want = both_engines(
        spark,
        docs,
        _bloom_pos("text", 3, 8192, P.SPARK),
        _bloom_pos("text", 3, 8192, P.DUCK),
    )
    assert got == want
    assert all(0 <= v < 8192 for v in got)


@SETTINGS
@given(docs=DOCS)
def test_classifier_bucket_agrees(spark, docs):
    from example_kafkastreams_spark.operators.quality_clf import bucket_sql

    got, want = both_engines(
        spark,
        docs,
        bucket_sql("text", 256, P.SPARK),
        bucket_sql("text", 256, P.DUCK),
    )
    assert got == want
    assert all(0 <= v < 256 for v in got)


@SETTINGS
@given(
    counts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_classifier_weight_agrees(spark, counts):
    """The floored-Laplace weight must be the same BIGINT in both
    engines for any count pair (one IEEE division of exact integers,
    floor never splits on rounding mode)."""
    import duckdb as _duck

    from example_kafkastreams_spark.operators.quality_clf import weight_sql

    rows = ", ".join(f"({cp}, {cn})" for cp, cn in counts)
    sdf = spark.createDataFrame(counts, "c_pos long, c_neg long")
    got = [
        r.w
        for r in sdf.selectExpr(
            f"{weight_sql('c_pos', 'c_neg')} AS w"
        ).collect()
    ]
    want = [
        r[0]
        for r in _duck.sql(
            f"SELECT {weight_sql('c_pos', 'c_neg')} AS w"
            f" FROM (VALUES {rows}) t(c_pos, c_neg)"
        ).fetchall()
    ]
    assert got == want


# --- Luhn card-number detection (round 10) ---------------------------------

DIGIT_RUN = st.text(alphabet="0123456789", min_size=1, max_size=22)
DIGIT_DOC = st.lists(
    st.one_of(TOKEN, DIGIT_RUN), min_size=1, max_size=12
).map(" ".join)


@SETTINGS
@given(docs=st.lists(DIGIT_DOC, min_size=1, max_size=8))
@example(docs=["pay 4111111111111111 order 1234567890123456 ok"])
@example(docs=["4539578763621486 79927398713 0000000000000"])
def test_cc_scrub_and_count_agree(spark, docs):
    """Luhn extraction, validation, and redaction must be identical in
    both engines for arbitrary digit-run/token mixes — including runs
    outside the 13-19 length window (ignored) and all-zero runs
    (checksum 0 ⇒ valid by Luhn, redacted in both engines or
    neither)."""
    got, want = both_engines(
        spark, docs, P.cc_scrub("text", P.SPARK), P.cc_scrub("text", P.DUCK)
    )
    assert got == want
    got, want = both_engines(
        spark, docs, P.cc_count("text", P.SPARK), P.cc_count("text", P.DUCK)
    )
    assert got == want


def test_luhn_known_vectors(spark):
    """Classic Luhn test numbers validate; off-by-one checksums do
    not; the Python check-digit twin closes valid numbers."""
    valid = ["4111111111111111", "4539578763621486"]
    invalid = ["1234567890123456", "4111111111111112"]
    sdf = spark.createDataFrame(
        [(t,) for t in valid + invalid], "text string"
    )
    got = [
        r.n
        for r in sdf.selectExpr(
            f"{P.cc_count('text', P.SPARK)} AS n"
        ).collect()
    ]
    assert got == [1, 1, 0, 0]
    base = "453957876362148"
    cd = P.luhn_check_digit_py(base)
    closed = base + str(cd)
    sdf2 = spark.createDataFrame([(closed,)], "text string")
    assert sdf2.selectExpr(
        f"{P.cc_count('text', P.SPARK)} AS n"
    ).collect()[0].n == 1


@SETTINGS
@given(docs=st.lists(DIGIT_DOC, min_size=1, max_size=6))
def test_cc_scrub_is_idempotent(spark, docs):
    """After a scrub no Luhn-valid run survives: cc_count over the
    scrubbed text is 0, so a second scrub is the identity (replacement
    text contains no digits; checksum-failing runs pass through both
    times)."""
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    scrubbed = P.cc_scrub("text", P.SPARK)
    rows = sdf.selectExpr(
        f"{scrubbed} AS once",
        f"{P.cc_count(scrubbed, P.SPARK)} AS n_after",
    ).collect()
    for r in rows:
        assert r.n_after == 0


@SETTINGS
@given(docs=DOCS)
def test_signed_feature_vec_agrees(spark, docs):
    """Signed feature-hash vectors: Spark == DuckDB == the Python twin
    that builds query-side literals (the maxsim branch's invariant)."""
    DIM, NH = 16, 4

    def expr(d):
        hashes = P.base_hash_array(P.split_ws("text", d), d)
        codes = P.signed_feature_codes(hashes, NH, DIM, d)
        return P.signed_feature_vec(codes, DIM, d)

    got, want = both_engines(spark, docs, expr(P.SPARK), expr(P.DUCK))
    assert [list(g) for g in got] == [list(w) for w in want]
    for doc, g in zip(docs, got):
        exp = [0] * DIM
        for t in doc.split():
            tv = P.signed_feature_vec_py(t, NH, DIM)
            exp = [a + b for a, b in zip(exp, tv)]
        assert list(g) == exp
