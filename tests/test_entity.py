"""Entity resolution — blocking + record linkage (operators/entity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.entity import (
    blocked_er_matches,
    rarest_token_blocks,
    token_df,
)


def _recs(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, name string, brand string, typ string"
    )


def test_rarest_token_block_prefers_discriminative_token(spark):
    # 'widget' appears 3x, 'crimson' once — the crimson widget blocks
    # on crimson; ties fall to the lexicographically smaller token
    recs = _recs(
        spark,
        [
            (1, "crimson widget", "b1", "t1"),
            (2, "small widget", "b1", "t1"),
            (3, "small widget", "b2", "t1"),
        ],
    )
    blocks = {r["id"]: r["block"] for r in
              rarest_token_blocks(recs, "id", "name").collect()}
    assert blocks[1] == "crimson"
    # 'small' (df 2) beats 'widget' (df 3) for records 2/3
    assert blocks[2] == blocks[3] == "small"
    dfs = {r["tok"]: r["df"] for r in token_df(recs, "id", "name").collect()}
    assert dfs == {"crimson": 1, "widget": 3, "small": 2}


def test_max_block_drops_boilerplate_blocks(spark):
    recs = _recs(
        spark,
        [(i, "common token", "b", "t") for i in range(10)],
    )
    assert rarest_token_blocks(recs, "id", "name", max_block=5).count() == 0
    assert rarest_token_blocks(recs, "id", "name", max_block=10).count() == 10


def test_match_semantics(spark):
    recs = _recs(
        spark,
        [
            (1, "red widget", "b1", "t1"),
            (2, "red widget", "b1", "t2"),   # name+brand: 0.8 -> match
            (3, "red widget", "b2", "t1"),   # name+type:  0.7 -> match
            (4, "red widget", "b3", "t9"),   # name only:  0.5 -> no
            (5, "red gadget", "b1", "t1"),   # j=1/3+0.5 = .667 -> no
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in blocked_er_matches(
            recs,
            "id",
            "name",
            exact_cols={"brand": 0.3, "typ": 0.2},
            threshold=0.7,
        ).collect()
    }
    assert (1, 2) in got and abs(got[(1, 2)] - 0.8) < 1e-9
    assert (1, 3) in got and abs(got[(1, 3)] - 0.7) < 1e-9
    assert all(4 not in pair for pair in got)
    assert all(5 not in pair for pair in got)
    # 2-3 share name only (brand and type both differ): 0.5 -> no
    assert (2, 3) not in got


def test_candidates_bounded_by_blocks(spark):
    """Records in different blocks are never compared, even when they
    would score above threshold — the blocking recall caveat, stated
    and pinned."""
    recs = _recs(
        spark,
        [
            # same brand+type (0.5) + j=1/3 -> 0.667 < 0.7 anyway, but
            # make the pair share NO rarest token: ruby/pearl blocks
            (1, "ruby clasp", "b1", "t1"),
            (2, "pearl clasp", "b1", "t1"),
            (3, "ruby clasp", "b1", "t1"),  # exact twin of 1 -> match
        ],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_er_matches(
            recs, "id", "name",
            exact_cols={"brand": 0.3, "typ": 0.2}, threshold=0.7,
        ).collect()
    }
    assert got == {(1, 3)}


def test_er_shuffles_carry_ids_not_pairs(spark):
    """Plan shape: the exchanges feeding the block self-join carry
    (id, token)-sized rows; no cartesian anywhere."""
    from example_kafkastreams_spark.catalog import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    plan = blocked_er_matches(
        part,
        "p_partkey",
        "p_name",
        exact_cols={"p_brand": 0.3, "p_type": 0.2},
        max_block=256,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_multikey_blocking_recovers_cross_name_match(spark):
    """num_keys=2 emits the second-rarest token too: a pair whose
    single rarest tokens differ but who share their next token meets
    in the shared block — the stated recall extension, measured."""
    recs = _recs(
        spark,
        [
            (1, "xxuniq shared", "b1", "t1"),
            (2, "yyuniq shared", "b1", "t1"),
            (3, "other thing", "b9", "t9"),
        ],
    )
    kw = dict(
        id_col="id",
        name_col="name",
        exact_cols={"brand": 0.3, "typ": 0.2},
        threshold=0.6,  # j=1/3 -> 0.5/3 + 0.3 + 0.2 = 0.667
    )
    from example_kafkastreams_spark.operators.entity import (
        blocked_er_matches as erm,
    )

    one = {(r["id_a"], r["id_b"]) for r in erm(recs, **kw).collect()}
    two_df = erm(recs, num_keys=2, **kw)
    two = [(r["id_a"], r["id_b"]) for r in two_df.collect()]
    assert (1, 2) not in one        # rarest tokens differ: never meet
    assert (1, 2) in two            # second key is the shared token
    assert len(two) == len(set(two))  # multi-block pairs deduped


def test_contract_exact_collapses_duplicates(spark):
    """An N-way duplicated catalog matches at REP grain under
    contraction: rep pairs equal the uncontracted matches projected
    onto min-id representatives."""
    base = [
        (1, "red widget", "b1", "t1"),
        (2, "red widget", "b1", "t2"),
        (3, "blue bolt", "b2", "t2"),
    ]
    dup = base + [
        (i + 100, n, b, t) for (i, n, b, t) in base
    ] + [(i + 200, n, b, t) for (i, n, b, t) in base]
    recs = _recs(spark, dup)
    from example_kafkastreams_spark.operators.entity import (
        blocked_er_matches as erm,
    )

    kw = dict(
        id_col="id", name_col="name",
        exact_cols={"brand": 0.3, "typ": 0.2}, threshold=0.7,
    )
    got = {
        (r["id_a"], r["id_b"]) for r in
        erm(recs, contract_exact=True, **kw).collect()
    }
    # reps are the min ids 1/2/3; only (1,2) scores 0.8
    assert got == {(1, 2)}
    # and the candidate volume collapsed: uncontracted compares the
    # 3x-duplicated block (9 reds -> 36 pairs), contracted just 1
    plain = erm(recs, **kw).count()
    assert plain > len(got)


def test_empty_name_records_drop_out_of_blocking(spark):
    """A record with no tokens emits no block key and silently forms
    no candidates (the documented behavior for empty names)."""
    recs = _recs(
        spark,
        [(1, "", "b", "t"), (2, "", "b", "t"), (3, "real part", "b", "t")],
    )
    from example_kafkastreams_spark.operators.entity import (
        blocked_er_matches as erm,
    )

    assert (
        erm(recs, "id", "name",
            exact_cols={"brand": 0.3, "typ": 0.2}).count() == 0
    )


def test_multikey_recall_case_under_the_oracle(spark):
    """The cross-name recall case re-derived by DuckDB running the
    q59 oracle's multi-key derivation (pranked rank <= j, per-key df
    cap, DISTINCT candidates, weighted score): (1, 2) invisible at
    num_keys=1, found at num_keys=2 — on BOTH engines, with equal
    (id_a, id_b, score) rows."""
    import duckdb

    from example_kafkastreams_spark.functions import portable as P

    D = P.DUCK
    rows = [
        (1, "xxuniq shared", "b1", "t1"),
        (2, "yyuniq shared", "b1", "t1"),
        (3, "other thing", "b9", "t9"),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE recs(id BIGINT, name VARCHAR, brand VARCHAR,"
        " typ VARCHAR)"
    )
    con.executemany("INSERT INTO recs VALUES (?, ?, ?, ?)", rows)

    def duck_pairs(num_keys: int):
        toks = P.filter_(
            P.distinct_(P.split_ws("name", D), D), "t", "t <> ''", D
        )
        sql = f"""
        WITH ptoks AS (
          SELECT id, {toks} AS toks, brand, typ FROM recs
        ),
        pex AS (SELECT id, unnest(toks) AS tok FROM ptoks),
        pdf AS (SELECT tok, count(*) AS df FROM pex GROUP BY tok),
        pranked AS (
          SELECT e.id, e.tok,
                 row_number() OVER (
                   PARTITION BY e.id ORDER BY d.df, e.tok) AS rn
          FROM pex e JOIN pdf d ON d.tok = e.tok
        ),
        pblock AS (
          SELECT id, tok AS block FROM pranked WHERE rn <= {num_keys}
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM pblock a JOIN pblock b
            ON a.block = b.block AND a.id < b.id
        )
        SELECT c.id_a, c.id_b,
               round(CAST(
                 CAST('0.5' AS DOUBLE)
                 * (CAST({P.size_(P.intersect_('ta.toks', 'tb.toks', D), D)}
                      AS DOUBLE)
                    / CAST({P.union_size('ta.toks', 'tb.toks', D)}
                      AS DOUBLE))
                 + CAST('0.3' AS DOUBLE) * (CASE WHEN ta.brand = tb.brand
                     THEN CAST('1.0' AS DOUBLE)
                     ELSE CAST('0.0' AS DOUBLE) END)
                 + CAST('0.2' AS DOUBLE) * (CASE WHEN ta.typ = tb.typ
                     THEN CAST('1.0' AS DOUBLE)
                     ELSE CAST('0.0' AS DOUBLE) END) AS DOUBLE), 6)
               AS score
        FROM cand c
        JOIN ptoks ta ON ta.id = c.id_a
        JOIN ptoks tb ON tb.id = c.id_b
        WHERE round(CAST(
                 CAST('0.5' AS DOUBLE)
                 * (CAST({P.size_(P.intersect_('ta.toks', 'tb.toks', D), D)}
                      AS DOUBLE)
                    / CAST({P.union_size('ta.toks', 'tb.toks', D)}
                      AS DOUBLE))
                 + CAST('0.3' AS DOUBLE) * (CASE WHEN ta.brand = tb.brand
                     THEN CAST('1.0' AS DOUBLE)
                     ELSE CAST('0.0' AS DOUBLE) END)
                 + CAST('0.2' AS DOUBLE) * (CASE WHEN ta.typ = tb.typ
                     THEN CAST('1.0' AS DOUBLE)
                     ELSE CAST('0.0' AS DOUBLE) END) AS DOUBLE), 6)
              >= CAST('0.6' AS DOUBLE)
        """
        return sorted(map(tuple, con.execute(sql).fetchall()))

    recs = _recs(spark, rows)
    kw = dict(
        id_col="id", name_col="name",
        exact_cols={"brand": 0.3, "typ": 0.2}, threshold=0.6,
    )

    def spark_pairs(num_keys: int):
        return sorted(
            (r["id_a"], r["id_b"], r["score"])
            for r in blocked_er_matches(
                recs, num_keys=num_keys, **kw
            ).collect()
        )

    d1, d2 = duck_pairs(1), duck_pairs(2)
    s1, s2 = spark_pairs(1), spark_pairs(2)
    assert s1 == d1
    assert s2 == d2
    assert all(p[:2] != (1, 2) for p in d1)
    assert any(p[:2] == (1, 2) for p in d2)


def test_survivorship_golden_records(spark):
    from example_kafkastreams_spark.operators.entity import (
        er_survivorship,
    )

    # two clusters: {1,2,3} via chained matches, {10,11} direct
    matches = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (10, 11, 0.95)],
        "id_a bigint, id_b bigint, score double",
    )
    records = spark.createDataFrame(
        [
            (1, "acme"),
            (2, "acme"),
            (3, "acme inc"),
            (10, "zeta"),
            (11, "yota"),
            (99, "unmatched"),
        ],
        "rid bigint, brand string",
    )
    got = {
        r["member"]: (r["golden"], r["attr"], r["attr_share"])
        for r in er_survivorship(
            matches, records, id_col="rid", attr_col="brand"
        ).collect()
    }
    # golden = min id of the transitive cluster
    assert got[1][0] == got[2][0] == got[3][0] == 1
    assert got[10][0] == got[11][0] == 10
    # majority fusion: 2/3 'acme'; tie in {10,11} resolves to the
    # lexicographically smaller value
    assert got[1][1] == "acme" and got[1][2] == 2.0 / 3.0
    assert got[10][1] == "yota" and got[10][2] == 0.5
    # unmatched records are not re-emitted
    assert 99 not in got
