"""Corpus-pipeline composition: the funnel built from oracle-checked
stages must plumb together — monotone survivor counts, canonical
survivors really are their cluster minima, chunks only from survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.pipelines import (
    build_pretrain_corpus,
    corpus_funnel_counts,
    corpus_stages,
)
from tests.conftest import SMOKE


def test_funnel_is_monotone_and_plumbed(spark):
    docs = load_table(spark, SMOKE, "documents")
    stages = corpus_stages(docs, min_quality=0.2, languages=("en", "de"))
    row = corpus_funnel_counts(stages).first()
    assert row["n_raw"] >= row["n_quality"] >= row["n_language"]
    assert row["n_language"] >= row["n_exact_dedup"]
    assert row["n_exact_dedup"] >= row["n_neardup_survivors"] > 0
    # chunking expands survivors, never invents documents
    n_chunk_docs = (
        stages["chunks"].select("doc_id").distinct().count()
    )
    assert n_chunk_docs == row["n_neardup_survivors"]
    assert row["n_chunks"] >= n_chunk_docs


def test_survivors_are_cluster_minima(spark):
    docs = load_table(spark, SMOKE, "documents")
    stages = corpus_stages(docs, min_quality=0.0, languages=("en", "de", "fr"))
    surv = stages["neardup_survivors"].select("doc_id")
    # no survivor may be an exact-text duplicate of a smaller doc_id
    dupe_of_smaller = (
        stages["language"].alias("a")
        .join(stages["language"].alias("b"), F.expr("a.text = b.text AND b.doc_id < a.doc_id"), "semi")
        .select("a.doc_id")
    )
    assert surv.join(dupe_of_smaller, "doc_id", "semi").count() == 0


def test_build_pretrain_corpus_schema(spark):
    docs = load_table(spark, SMOKE, "documents")
    chunks = build_pretrain_corpus(docs, min_quality=0.0)
    assert [f.name for f in chunks.schema.fields] == [
        "doc_id", "chunk_idx", "chunk_text", "n_tokens",
    ]
    assert chunks.filter(F.col("n_tokens") <= 0).count() == 0


def test_funnel_minhash_sketch_path(spark):
    """sketch='minhash' swaps the near-dup notion (shingle-Jaccard via
    star-contracted minhash_components_edges) without changing the
    funnel's contract: monotone counts, survivors still cluster minima
    for exact duplicates (identical texts hash to identical signatures
    under EITHER sketch, so exact-dup groups always contract)."""
    import pytest

    docs = load_table(spark, SMOKE, "documents")
    stages = corpus_stages(
        docs, min_quality=0.0, languages=("en", "de", "fr"),
        sketch="minhash", minhash_threshold=0.5,
    )
    row = corpus_funnel_counts(stages).first()
    assert row["n_exact_dedup"] >= row["n_neardup_survivors"] > 0
    dupe_of_smaller = (
        stages["language"].alias("a")
        .join(
            stages["language"].alias("b"),
            F.expr("a.text = b.text AND b.doc_id < a.doc_id"),
            "semi",
        )
        .select("a.doc_id")
    )
    surv = stages["neardup_survivors"].select("doc_id")
    assert surv.join(dupe_of_smaller, "doc_id", "semi").count() == 0

    with pytest.raises(ValueError, match="sketch"):
        corpus_stages(docs, sketch="phash")["neardup_survivors"]


def test_funnel_packing_stage(spark):
    """pack_budget adds a final canonical-packing stage: every funnel
    chunk lands in exactly one pack, token totals conserve, and
    build_pretrain_corpus returns the pack table."""
    docs = load_table(spark, SMOKE, "documents")
    stages = corpus_stages(docs, pack_budget=96)
    chunks = stages["chunks"].agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    packs = stages["packs"].agg(
        F.sum("n_chunks").alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    assert (packs["n"], packs["t"]) == (chunks["n"], chunks["t"])
    assert build_pretrain_corpus(docs, pack_budget=96).columns == [
        "pack_id", "n_chunks", "n_tokens", "text"
    ]


def test_lm_filter_stage_matches_standalone_score(spark):
    """lm_range composes the CCNet-placement LM filter between the
    language stage and dedup: kept set == an independent recompute of
    the window on standalone lm_score (score-less short docs pass),
    downstream dedup consumes the filtered set, and the default path
    stays stage-identical."""
    from example_kafkastreams_spark.operators.lm import lm_score

    docs = load_table(spark, SMOKE, "documents")
    base = corpus_stages(docs)
    assert "lm_filtered" not in base

    # pick a window from the observed score distribution so the test
    # provably cuts both tails on this corpus
    lang = base["language"]
    scores = sorted(
        r.lm_score for r in lm_score(lang).select(
            "doc_id", "lm_score"
        ).collect()
    )
    lo, hi = scores[len(scores) // 10], scores[-len(scores) // 10]
    assert lo > scores[0] and hi < scores[-1]

    stages = corpus_stages(docs, lm_range=(lo, hi))
    kept = {r.doc_id for r in stages["lm_filtered"].select("doc_id").collect()}
    by_id = {
        r.doc_id: r.lm_score
        for r in lm_score(stages["language"]).collect()
    }
    expected = {
        r.doc_id
        for r in stages["language"].select("doc_id").collect()
        if r.doc_id not in by_id or lo <= by_id[r.doc_id] <= hi
    }
    assert kept == expected
    lang_n = stages["language"].count()
    assert 0 < len(kept) < lang_n  # both tails actually cut
    # dedup runs on the filtered set
    assert stages["exact_dedup"].count() <= len(kept)
    dedup_ids = {
        r.doc_id for r in stages["exact_dedup"].select("doc_id").collect()
    }
    assert dedup_ids <= kept


def _py_normalize(text):
    """Pure-Python replay of functions.portable.normalize_text — the
    same ordered chain (mojibake → NFC-lite → CR→LF → control strip →
    space/tab collapse → trim)."""
    import re

    from example_kafkastreams_spark.functions.portable import (
        MOJIBAKE_FIXES,
        NFC_FIXES,
    )

    out = text
    for seq, rep in MOJIBAKE_FIXES + NFC_FIXES:
        out = out.replace(seq, rep)
    out = out.replace("\r\n", "\n").replace("\r", "\n")
    out = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", out)
    out = re.sub("[ \t]+", " ", out)
    return out.strip(" ")


def test_funnel_normalize_stage(spark):
    """normalize=True canonicalizes BEFORE every other stage: the
    'normalized' stage matches the pure-Python replay of the chain on
    adversarial text, downstream stages consume the canonical text,
    and normalize=False (the default) keeps the funnel bit-unchanged
    (q63's contract)."""
    messy = [
        (1, "mojibake â€™quoteâ€™ and CafÃ© text more filler words here", "web"),
        (2, "NFC café und über tokens fill out the line", "web"),
        (3, "ctrl\x00\x01 here\x7f and\r\nlines\rtoo with more words", "web"),
        (4, "plain  double  spaces\tand tabs all over the line ", "web"),
    ]
    docs = spark.createDataFrame(
        messy, "doc_id long, text string, source string"
    )
    stages = corpus_stages(
        docs, min_quality=0.0, languages=("en", "de", "fr"), normalize=True
    )
    got = {r.doc_id: r.text for r in stages["normalized"].collect()}
    want = {i: _py_normalize(t) for i, t, _ in messy}
    assert got == want
    # every downstream stage sees canonical text only
    for r in stages["quality"].select("text").collect():
        assert r.text == _py_normalize(r.text)

    # default path bit-unchanged
    base = corpus_stages(docs, min_quality=0.0, languages=("en", "de", "fr"))
    assert "normalized" not in base
    assert sorted(
        (r.doc_id, r.text) for r in base["quality"].collect()
    ) == sorted((i, t) for i, t, _ in messy)


def test_delta_funnel_normalize_stage(spark):
    """The day-2 funnel normalizes the delta with the same chain
    BEFORE any index probe — a delta doc that is a mojibake twin of an
    admitted day-1 doc must exact-dedup away once both sides are
    canonical."""
    from example_kafkastreams_spark.pipelines import corpus_stages_delta

    clean = "the team ran the big hash join benchmark again today"
    day1 = spark.createDataFrame(
        [(1, clean, "web"), (2, "completely different filler text body here", "web")],
        "doc_id long, text string, source string",
    )
    d1 = corpus_stages(
        day1, min_quality=0.0, languages=("en", "de", "fr"), normalize=True
    )
    mojibake_twin = clean.replace("the team", "the\tteam") + " "
    delta = spark.createDataFrame(
        [(10, mojibake_twin, "web"), (11, "novel delta document with its own words", "web")],
        "doc_id long, text string, source string",
    )
    d2 = corpus_stages_delta(
        delta,
        digest_index=d1["exact_dedup"].selectExpr(
            "md5(text) AS content_hash"
        ),
        band_index=None,
        min_quality=0.0,
        languages=("en", "de", "fr"),
        normalize=True,
    )
    assert "normalized" in d2
    admitted = {r.doc_id for r in d2["exact_admitted"].collect()}
    assert 10 not in admitted  # canonical twin of admitted day-1 text
    assert 11 in admitted


def test_clf_filter_stage_matches_standalone_score(spark):
    """clf_seed composes the DCLM-placement model filter between the
    LM gate slot and dedup: kept set == an independent train+score of
    the standalone classifier on the same stage input, downstream
    dedup consumes the filtered set, and the default path stays
    stage-identical."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.quality_clf import (
        score_inline,
        train_hashed_classifier,
        weights_vector,
    )

    real = load_table(spark, SMOKE, "documents")
    assert "clf_filtered" not in corpus_stages(real)

    # the testdata corpus is vocabulary-uniform (every doc scores the
    # same side), so inject spam docs with a DISTINCTIVE vocabulary:
    # repetitive enough that the quality heuristic seed-labels them
    # negative, English-markered enough to survive language ID — the
    # classifier must then learn their vocabulary and cut them while
    # keeping the real corpus
    spam_text = (
        "the casino bonus is the jackpot and the casino bonus is "
        "the jackpot and " * 6
    ).strip()
    spam = spark.createDataFrame(
        [
            (900000 + i, spam_text + f" offer{i}", "en", "spamnet", 1)
            for i in range(40)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    docs = real.unionByName(spam)

    stages = corpus_stages(docs, clf_seed=0.645)
    lang = stages["language"]
    lang_ids = {r.doc_id for r in lang.select("doc_id").collect()}
    assert any(i >= 900000 for i in lang_ids)  # spam reaches the stage
    kept = {
        r.doc_id for r in stages["clf_filtered"].select("doc_id").collect()
    }
    labeled = lang.withColumn("__pos", F.col("quality_score") >= 0.645)
    w = weights_vector(train_hashed_classifier(labeled, "__pos"))
    expected = {
        r.doc_id
        for r in score_inline(lang, w).filter(F.col("clf_keep")).collect()
    }
    assert kept == expected
    # the model actually cuts: every spam doc dropped, real docs kept
    assert all(i < 900000 for i in kept)
    assert len(kept) > 0.9 * len([i for i in lang_ids if i < 900000])
    # dedup consumes the filtered set
    exact_ids = {
        r.doc_id for r in stages["exact_dedup"].select("doc_id").collect()
    }
    assert exact_ids <= kept


def test_funnel_budget_mixing_stage(spark):
    """mix_budget caps the surviving corpus at an absolute budget
    with water-filled per-source quotas; mutually exclusive with the
    other mixers; default path stage-identical."""
    import pytest

    from example_kafkastreams_spark.operators.mixing import (
        budget_quotas,
        mix_sources_budget,
    )

    docs = load_table(spark, SMOKE, "documents")
    base = corpus_stages(docs)
    base_n = base["neardup_survivors"].count()
    budget = base_n // 3
    stages = corpus_stages(docs, mix_budget=(budget, 0.5))
    kept = stages["neardup_survivors"].count()
    assert abs(kept - budget) <= 4 * (budget ** 0.5) + 5, (kept, budget)
    # stage output == the standalone operator on the same input (the
    # base funnel's survivor set IS the mixer's input by construction)
    pre_mix = base["neardup_survivors"]
    want = {
        r.doc_id
        for r in mix_sources_budget(pre_mix, budget, 0.5).collect()
    }
    got = {
        r.doc_id for r in stages["neardup_survivors"].collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        corpus_stages(docs, mix_alpha=0.5, mix_budget=(10, 0.5))


def test_funnel_decontam_stage(spark):
    """decontam_bench drops benchmark-contaminated docs post-dedup:
    the bloom mode removes a superset of the exact mode's drops (no
    false negatives), both consume the same stage input, and the
    default path stays stage-identical."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.decontam import (
        contamination_report,
    )

    docs = load_table(spark, SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    assert "decontaminated" not in corpus_stages(docs)

    stages_b = corpus_stages(docs, decontam_bench=bench)
    stages_e = corpus_stages(
        docs, decontam_bench=bench, decontam_mode="exact"
    )
    # compare against the pre-decontam survivor set: rebuild it from
    # the default funnel (identical upstream stages)
    base = corpus_stages(docs)
    base_ids = {
        r.doc_id
        for r in base["neardup_survivors"].select("doc_id").collect()
    }
    kept_b = {
        r.doc_id
        for r in stages_b["decontaminated"].select("doc_id").collect()
    }
    kept_e = {
        r.doc_id
        for r in stages_e["decontaminated"].select("doc_id").collect()
    }
    exact_flagged = {
        r.doc_id
        for r in contamination_report(
            base["neardup_survivors"], bench
        ).collect()
    }
    assert kept_e == base_ids - exact_flagged
    assert kept_b <= kept_e  # bloom drops a superset (no false negatives)
    assert kept_b  # something survives
    # the benchmark members themselves are in the corpus, so they MUST
    # be flagged (self-contamination) whenever they survived upstream
    assert not (kept_b & {r.doc_id for r in bench.collect()})


def test_funnel_all_optional_stages_compose(spark):
    """Kitchen-sink integration: every optional stage enabled at once
    (normalize + line clean + ExactSubstr + LM window + classifier +
    mixing + packing) must plumb — stage entries all present, counts
    monotone through the document-grain stages, packs non-empty and
    budget-bounded. Guards against a new stage composing with its
    neighbors only in isolation."""
    docs = load_table(spark, SMOKE, "documents")
    stages = corpus_stages(
        docs,
        min_quality=0.0,
        languages=("en", "de", "fr"),
        normalize=True,
        line_clean={},
        substr_k=24,
        lm_range=(0.05, 0.95),
        clf_seed=0.645,
        decontam_bench=docs.filter(F.col("doc_id") % 97 == 0),
        pack_budget=96,
    )
    for key in (
        "normalized", "line_cleaned", "substr_cleaned", "quality",
        "language", "lm_filtered", "clf_filtered", "exact_dedup",
        "decontaminated", "neardup_survivors", "chunks", "packs",
    ):
        assert key in stages, key
    n = {k: stages[k].select("doc_id").distinct().count()
         for k in ("normalized", "quality", "language", "lm_filtered",
                   "clf_filtered", "exact_dedup", "neardup_survivors")}
    assert (
        n["normalized"] >= n["quality"] >= n["language"]
        >= n["lm_filtered"] >= n["clf_filtered"] >= n["exact_dedup"]
        >= n["neardup_survivors"] > 0
    ), n
    packs = stages["packs"].collect()
    assert packs
    budgeted = [p for p in packs if p.n_tokens > 96]
    # a single over-budget chunk may exceed the budget alone; packs of
    # 2+ chunks never do (the packer's close rule)
    assert all(p.n_chunks == 1 for p in budgeted)


def test_funnel_temperature_mixing_stage(spark):
    """mix_alpha composes at the same post-dedup placement as
    mixture_weights: the funnel's survivor set equals applying
    mix_sources_temperature to the default funnel's neardup_survivors
    (compositional identity), downstream chunks come only from mixed
    survivors, and the two mixing knobs refuse to combine."""
    import pytest

    from example_kafkastreams_spark.operators.mixing import (
        mix_sources_temperature,
    )

    docs = load_table(spark, SMOKE, "documents")
    base = corpus_stages(docs, min_quality=0.2, languages=("en", "de"))
    mixed = corpus_stages(
        docs, min_quality=0.2, languages=("en", "de"), mix_alpha=0.5
    )
    want = sorted(
        r.doc_id
        for r in mix_sources_temperature(
            base["neardup_survivors"], 0.5
        ).collect()
    )
    got = sorted(
        r.doc_id for r in mixed["neardup_survivors"].collect()
    )
    assert got == want and 0 < len(got) < base[
        "neardup_survivors"
    ].count()
    chunk_docs = {
        r.doc_id for r in mixed["chunks"].select("doc_id").distinct().collect()
    }
    assert chunk_docs == set(got)

    with pytest.raises(ValueError, match="mutually exclusive"):
        corpus_stages(docs, mixture_weights={"a": 1.0}, mix_alpha=0.5)
