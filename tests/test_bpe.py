"""BPE tokenization (operators.bpe) — classic-algorithm conformance,
determinism, distributed-encode equality with the sequential path."""

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    encode_word,
    train_bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_learns_frequent_pair_first(spark):
    # "aa" dominates: the first merge must be ('a','a')
    docs = _docs(spark, ["aaaa aaaa aaaa ab"])
    merges = train_bpe_merges(docs, num_merges=3)
    assert merges[0] == ("a", "a")


def test_train_matches_reference_implementation(spark):
    """Pin against an independent in-test implementation of the
    Sennrich et al. loop on a small corpus."""
    corpus = ["low lower lowest low low", "newer newest new low"]
    docs = _docs(spark, corpus)
    got = train_bpe_merges(docs, num_merges=6)

    from collections import Counter

    counts = Counter(w for t in corpus for w in t.split())
    words = {tuple(w) + (END_OF_WORD,): c for w, c in counts.items()}
    want = []
    for _ in range(6):
        pairs = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        want.append(best)
        nw = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and (sym[i], sym[i + 1]) == best
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    assert got == want


def test_encode_word_applies_rank_order():
    # greedy lowest rank first: a,b,c,</w> -> ab,c,</w> (rank 0)
    # -> abc,</w> (rank 1 beats rank 2) -> stop ((abc,</w>) unranked)
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", END_OF_WORD): 2}
    assert encode_word("abc", ranks) == ["abc", END_OF_WORD]


def test_encode_word_leftmost_on_equal_rank():
    ranks = {("a", "a"): 0}
    # aaa -> leftmost pair merges first: (aa, a, </w>)
    assert encode_word("aaa", ranks) == ["aa", "a", END_OF_WORD]


def test_distributed_encode_matches_sequential(spark):
    corpus = [
        "low lower lowest low low",
        "newer newest new low",
        "the lowest newest low",
    ]
    docs = _docs(spark, corpus)
    merges = train_bpe_merges(docs, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    for i, text in enumerate(corpus):
        want = [t for w in text.split() for t in encode_word(w, ranks)]
        assert got[i] == (want, len(want))


def test_encode_partition_independent(spark):
    docs = _docs(spark, [f"token{i} alpha beta gamma" for i in range(20)])
    merges = train_bpe_merges(docs, num_merges=15)
    a = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, merges).collect()}
    b = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(docs.repartition(6), merges).collect()
    }
    assert a == b


def test_encode_on_real_documents_counts(spark):
    from example_kafkastreams_spark.catalog import load_table
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents")
    merges = train_bpe_merges(docs.limit(50), num_merges=40)
    out = bpe_encode(docs, merges)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("mn"),
    ).collect()[0]
    assert row.n == docs.count() and row.mn > 0
    # every word ends with the end-of-word marker boundary: token
    # stream rejoins to the original word count
    sample = out.limit(5).collect()
    for r in sample:
        joined = "".join(r.tokens)
        n_words = joined.count(END_OF_WORD)
        orig = (
            docs.filter(F.col("doc_id") == r.doc_id).collect()[0].text
        )
        assert n_words == len(orig.split())


def test_bpe_chunks_pack_composition(spark):
    """BPE tokens -> chunk_token_arrays -> pack_chunks: budgets count
    real subword tokens end to end, token conservation holds at every
    stage, and the whole chain is partition-independent."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.packing import pack_chunks
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_token_arrays,
    )
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").limit(60)
    merges = train_bpe_merges(docs, num_merges=30)
    toks = bpe_encode(docs, merges).select("doc_id", "tokens")
    chunks = chunk_token_arrays(
        toks, tokens_col="tokens", chunk_size=16, stride=16
    )
    # non-overlapping stride: chunk token counts re-add to the doc's
    n_tok = {r.doc_id: r.n for r in toks.select(
        "doc_id", F.size("tokens").alias("n")).collect()}
    per_doc = {
        r.doc_id: r.s
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    assert per_doc == n_tok
    packs = pack_chunks(chunks, budget=48, canonical=True)
    total = packs.agg(F.sum("n_tokens").alias("s")).collect()[0].s
    assert total == sum(n_tok.values())
    a = sorted(r.pack_id for r in packs.collect())
    b = sorted(
        r.pack_id
        for r in pack_chunks(
            chunks.repartition(5), budget=48, canonical=True
        ).collect()
    )
    assert a == b


def test_train_bpe_max_vocab_bounds_collect(spark):
    """max_vocab bounds the training collect by construction: under
    the cap the merge table is bit-identical to the unbounded path; a
    tight cap trains only on the capped head and still yields a valid
    table."""
    from example_kafkastreams_spark.operators.bpe import (
        _word_counts,
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest newest"),
            (2, "wider wider newest low lowest"),
        ],
        "doc_id long, text string",
    )
    unbounded = train_bpe_merges(docs, num_merges=20, max_vocab=None)
    default_cap = train_bpe_merges(docs, num_merges=20)  # 65536 cap
    assert default_cap == unbounded

    # a tight cap keeps exactly the top-N (count desc, word asc) words
    capped = _word_counts(docs, "text", 2)
    assert set(capped) == {"newest", "low"}  # 5x and 4x
    tight = train_bpe_merges(docs, num_merges=20, max_vocab=2)
    assert tight  # still a valid, deterministic table
    assert tight == train_bpe_merges(docs, num_merges=20, max_vocab=2)
