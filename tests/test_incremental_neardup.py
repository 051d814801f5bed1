"""Incremental near-dup band index (VERDICT r5 item 2): a two-delta
ingest through the persistent (band_key -> rep, sig) index must reach
EXACTLY the transitive closure a one-shot ``minhash_components_edges``
over the full corpus reaches — the near-dup analog of the digest
index's cross-job contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.neardup import (
    incremental_minhash_edges,
    minhash_band_index,
    minhash_components_edges,
)

KW = dict(num_hashes=12, bands=4, shingle_n=3)

BASE = [
    "the quick brown fox jumps over the lazy dog near the old river bank",
    "a tall green tree stands alone on the wide open hill above the town",
    "many small boats sail across the calm blue sea under a bright sky",
    "the old stone house at the end of the road has a red wooden door",
    "fresh bread and warm soup wait on the long table in the quiet room",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _closure(edge_rows, nodes):
    """Partition of ``nodes`` under the collected edge list (plain
    union-find — independent of the components operator under test)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, set] = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return sorted(map(frozenset, groups.values()), key=min)


def _variant(text: str, i: int) -> str:
    toks = text.split()
    toks[i % len(toks)] = f"tok{i}"
    return " ".join(toks)


def test_two_delta_ingest_equals_one_shot_closure(spark):
    # corpus: each base text + an exact copy; delta1: near-variants of
    # corpus texts + one new unique; delta2: exact copies of corpus
    # AND delta1 content + its own variant chain
    corpus_rows = [(i, BASE[i % 5]) for i in range(10)]
    delta1_rows = (
        [(20 + i, _variant(BASE[i], 1)) for i in range(5)]
        + [(25, "completely novel words about winter snow and ice falls")]
    )
    delta2_rows = (
        [(40, BASE[2]), (41, _variant(BASE[2], 1)), (42, _variant(BASE[2], 2))]
        + [(43, "completely novel words about winter snow and ice falls")]
        + [(44, "another fully distinct document text with singular content here")]
    )
    all_rows = corpus_rows + delta1_rows + delta2_rows
    nodes = [r[0] for r in all_rows]

    one_shot = minhash_components_edges(_docs(spark, all_rows), **KW)
    want = _closure(
        [(r.doc_a, r.doc_b) for r in one_shot.collect()], nodes
    )

    corpus = _docs(spark, corpus_rows)
    idx0 = minhash_band_index(corpus, **KW).persist()
    e0 = minhash_components_edges(corpus, **KW)
    e1, d1 = incremental_minhash_edges(_docs(spark, delta1_rows), idx0, **KW)
    idx1 = idx0.unionByName(d1).persist()
    e2, d2 = incremental_minhash_edges(_docs(spark, delta2_rows), idx1, **KW)

    got_edges = [
        (r.doc_a, r.doc_b)
        for e in (e0, e1, e2)
        for r in e.collect()
    ]
    assert _closure(got_edges, nodes) == want

    # index invariant: sigs(index') == distinct sigs of everything
    # ingested so far — identical delta sigs add NO rows
    from example_kafkastreams_spark.operators.neardup import (
        _rebalance,
        with_minhash,
    )

    idx2 = idx1.unionByName(d2)
    want_sigs = {
        tuple(r.sig)
        for r in with_minhash(_rebalance(_docs(spark, all_rows), "doc_id"))
        .select("sig")
        .distinct()
        .collect()
    }
    got_sigs = {tuple(r.sig) for r in idx2.select("sig").distinct().collect()}
    assert got_sigs == want_sigs
    # one rep per distinct sig, `bands` band rows each
    per_sig = idx2.groupBy("sig").agg(
        F.countDistinct("doc_id").alias("n_ids"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    bad = per_sig.filter(
        (F.col("n_ids") != 1) | (F.col("n_rows") != KW["bands"])
    ).count()
    assert bad == 0
    idx0.unpersist()
    idx1.unpersist()


def test_cross_edges_require_agreement(spark):
    """A band collision alone is not an edge: cross pairs verify
    signature agreement >= threshold, so raising the threshold to an
    impossible level keeps only the identical-sig cross edges."""
    corpus = _docs(spark, [(0, BASE[0]), (1, BASE[1])])
    idx = minhash_band_index(corpus, **KW)
    delta = _docs(
        spark, [(10, BASE[0]), (11, _variant(BASE[0], 1))]
    )
    e_lo, _ = incremental_minhash_edges(delta, idx, threshold=0.5, **KW)
    e_hi, _ = incremental_minhash_edges(delta, idx, threshold=1.0, **KW)
    lo = {(r.doc_a, r.doc_b) for r in e_lo.collect()}
    hi = {(r.doc_a, r.doc_b) for r in e_hi.collect()}
    assert (0, 10) in lo  # exact copy bridges corpus and delta
    assert (0, 10) in hi  # agreement 1.0 survives any threshold
    assert hi <= lo  # tightening can only drop edges


def test_bucketed_band_index_saves_index_exchange(spark, tmp_path):
    """The docstring's scale claim, plan-proved: with the band index
    stored BUCKETED on its join keys, the index side of the delta
    cross-join needs no exchange — the incremental plan has exactly
    one fewer shuffle than with a plain parquet index, and identical
    edges."""
    import shutil

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.plans import count_exchanges
    from example_kafkastreams_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx_df = minhash_band_index(corpus, **KW)

    plain_path = str(tmp_path / "band_index")
    idx_df.write.parquet(plain_path)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    spark.sql("DROP TABLE IF EXISTS bkt_band_index")
    shutil.rmtree(f"{warehouse}/bkt_band_index", ignore_errors=True)
    write_bucketed(
        idx_df, "bkt_band_index", ["band_idx", "band_key"], num_buckets=8
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e_plain, _ = incremental_minhash_edges(
            delta, spark.read.parquet(plain_path), **KW
        )
        e_bkt, _ = incremental_minhash_edges(
            delta, read_bucketed(spark, "bkt_band_index"), **KW
        )
        assert (
            count_exchanges(e_bkt) == count_exchanges(e_plain) - 1
        ), e_bkt._jdf.queryExecution().toString()
        assert sorted(map(tuple, e_bkt.collect())) == sorted(
            map(tuple, e_plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_admit_against_band_index_two_deltas(spark):
    """The batch admission contract: delta-1 bootstraps (min-id per
    component survives, index holds every admitted sig); delta-2 drops
    near-dups of admitted content — INCLUDING a variant of a doc that
    was itself dropped in delta-1 (its sig entered the index with its
    admitted component) — and admits genuinely new content."""
    from example_kafkastreams_spark.operators.neardup import (
        admit_against_band_index,
    )

    d1 = _docs(spark, [
        (1, BASE[0]),
        (2, BASE[0]),            # exact copy -> dropped, sig admitted
        (3, _variant(BASE[0], 1)),  # near-dup of 1 -> dropped if linked
        (4, BASE[1]),
    ])
    s1, i1 = admit_against_band_index(d1, None, **KW)
    surv1 = {r.doc_id for r in s1.collect()}
    assert 1 in surv1 and 2 not in surv1 and 4 in surv1
    idx = i1.persist()
    # index = admitted components' sigs: at least the two base sigs
    n_sigs1 = idx.select("sig").distinct().count()
    assert n_sigs1 >= 2

    d2 = _docs(spark, [
        (10, BASE[0]),              # exact copy of admitted -> dropped
        (11, _variant(BASE[0], 1)),  # copy of delta-1's DROPPED variant
        (12, BASE[2]),              # new -> admitted
    ])
    s2, i2 = admit_against_band_index(d2, idx, **KW)
    surv2 = {r.doc_id for r in s2.collect()}
    assert 10 not in surv2
    assert 12 in surv2
    if 3 not in surv1:
        # the variant's sig was admitted with component 1 -> its copy
        # collides at agreement 1.0 and must drop
        assert 11 not in surv2
    # appended index keeps the one-rep-per-sig invariant
    both = idx.unionByName(i2)
    bad = (
        both.groupBy("sig")
        .agg(F.countDistinct("doc_id").alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    assert bad == 0
    idx.unpersist()


def test_simhash_two_delta_ingest_equals_one_shot_closure(spark):
    """The SimHash twin of the MinHash closure proof: two deltas
    through simhash_band_index / incremental_simhash_edges reach the
    one-shot simhash_components_edges closure."""
    from example_kafkastreams_spark.operators.neardup import (
        incremental_simhash_edges,
        simhash_band_index,
        simhash_components_edges,
    )

    corpus_rows = [(i, BASE[i % 5]) for i in range(10)]
    delta1_rows = (
        [(20 + i, _variant(BASE[i], 1)) for i in range(5)]
        + [(25, "completely novel words about winter snow and ice falls")]
    )
    delta2_rows = (
        [(40, BASE[2]), (41, _variant(BASE[2], 1)), (42, _variant(BASE[2], 2))]
        + [(43, "completely novel words about winter snow and ice falls")]
        + [(44, "another fully distinct document text with singular content here")]
    )
    all_rows = corpus_rows + delta1_rows + delta2_rows
    nodes = [r[0] for r in all_rows]
    H = 3

    one_shot = simhash_components_edges(
        _docs(spark, all_rows), max_hamming=H
    )
    want = _closure(
        [(r.doc_a, r.doc_b) for r in one_shot.collect()], nodes
    )

    corpus = _docs(spark, corpus_rows)
    idx0 = simhash_band_index(corpus).persist()
    e0 = simhash_components_edges(corpus, max_hamming=H)
    e1, d1 = incremental_simhash_edges(
        _docs(spark, delta1_rows), idx0, max_hamming=H
    )
    idx1 = idx0.unionByName(d1).persist()
    e2, _ = incremental_simhash_edges(
        _docs(spark, delta2_rows), idx1, max_hamming=H
    )
    got_edges = [
        (r.doc_a, r.doc_b)
        for e in (e0, e1, e2)
        for r in e.collect()
    ]
    assert _closure(got_edges, nodes) == want
    idx0.unpersist()
    idx1.unpersist()


def test_containment_catches_jaccard_blind_superset(spark):
    """The operator's reason to exist: a small document embedded in a
    much larger one has containment ~1 but Jaccard far below any dedup
    gate — containment_pairs must flag it, and the directed values
    must point the right way (A in B, not B in A)."""
    from example_kafkastreams_spark.operators.neardup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} tok{i} pad{i}" for i in range(60))
    big = small + " " + filler
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "entirely different content here")],
        "doc_id long, text string",
    )
    got = containment_pairs(
        docs, sample_mod=1, min_shared=1, threshold=0.8
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in got}
    assert (1, 2) in pairs, "embedded small doc must flag"
    r = pairs[(1, 2)]
    assert r.cont_a_in_b == 1.0          # every small-doc shingle in big
    assert r.cont_b_in_a < 0.2           # big doc NOT inside small
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # the same pair is invisible to a 0.5-Jaccard gate
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not any(r.doc_a == 1 and r.doc_b == 2 for r in jac)


def test_containment_stop_shingle_cap_and_sampling_determinism(spark):
    """df-capped shingles leave the index (no quadratic boilerplate
    blowup — a pair whose ONLY overlap is the universal boilerplate
    yields no candidate), and the survivor set is repartition-
    invariant (every choice content-hash-derived)."""
    from example_kafkastreams_spark.operators.neardup import (
        containment_pairs,
    )

    boiler = "copyright footer legal notice reserved rights"
    rows = [
        (i, f"{boiler} unique{i} distinct{i} body{i} text{i}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_pairs(
        docs, sample_mod=1, max_df=5, min_shared=1, threshold=0.5
    ).collect()
    assert got == [], "boilerplate-only overlap must not flag"

    a = sorted(
        map(tuple, containment_pairs(
            docs.repartition(7), sample_mod=1, max_df=5,
            min_shared=1, threshold=0.5,
        ).collect())
    )
    b = sorted(
        map(tuple, containment_pairs(
            docs.coalesce(1), sample_mod=1, max_df=5,
            min_shared=1, threshold=0.5,
        ).collect())
    )
    assert a == b
