"""boilerplate_strip, dup_ngram_fraction, dsir_weights, bpe_merges."""

from __future__ import annotations

import math


def test_boilerplate_strip_removes_repeated_sentence(spark):
    from etl_gcp_spark.operators.corpus import boilerplate_strip

    banner = "this cookie banner sentence repeats"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}. unique alpha content here"),
            (2, f"{banner}. unique beta content here"),
            (3, "totally original text without banner"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(docs, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "unique alpha content here"
    assert out[1]["n_removed"] == 1 and out[1]["n_kept"] == 1
    assert out[2]["clean_text"] == "unique beta content here"
    # untouched doc round-trips byte-identically
    assert out[3]["clean_text"] == "totally original text without banner"
    assert out[3]["n_removed"] == 0


def test_boilerplate_strip_is_identity_without_repeats(spark, sf_dir):
    from etl_gcp_spark.operators.corpus import boilerplate_strip
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    joined = (
        boilerplate_strip(docs, min_docs=3)
        .join(docs.select("doc_id", "text"), "doc_id")
        .collect()
    )
    # the synthetic corpus has no '. ' separators: reassembly must
    # reproduce the trimmed original exactly (split/concat fidelity)
    assert len(joined) == 40
    for r in joined:
        assert r["clean_text"] == r["text"].strip()
        assert r["n_removed"] == 0


def test_dup_ngram_fraction_flags_the_copy(spark):
    from etl_gcp_spark.operators.text_dedup import dup_ngram_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),  # exact copy: every trigram shared
            (3, "x y z w q"),  # disjoint: nothing shared
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in dup_ngram_fraction(docs).collect()
    }
    assert out[1]["dup_fraction"] == 1.0
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["dup_fraction"] == 0.0
    assert out[1]["n_ngrams"] == 3  # distinct trigrams of 5 tokens


def test_dup_ngram_fraction_counts_distinct_grams(spark):
    from etl_gcp_spark.operators.text_dedup import dup_ngram_fraction

    # "a b a b a b" has trigrams {aba, bab} x2 occurrences each, but
    # distinct grams are counted once; no other doc shares them
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    (row,) = dup_ngram_fraction(docs).collect()
    assert row["n_ngrams"] == 2
    assert row["dup_fraction"] == 0.0


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from etl_gcp_spark.operators.corpus import dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "wiki wiki science article", "tgt"),
            (2, "wiki science article text", "raw"),  # target-like
            (3, "spam spam click here now", "raw"),  # not target-like
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(docs, target_source="tgt").collect()
    }
    assert set(out) == {2, 3}  # target shard itself is excluded
    assert out[2] > out[3]


def test_dsir_weights_exact_single_token(spark):
    from etl_gcp_spark.operators.corpus import dsir_weights

    # one-token corpus: tgt has {a}, raw has {a}; vocab={a}, V=1
    # llr(a) = ln((1+1)/(1+1)) - ln((1+1)/(1+1)) = 0
    docs = spark.createDataFrame(
        [(1, "a", "tgt"), (2, "a", "raw")],
        "doc_id long, text string, source string",
    )
    (row,) = dsir_weights(docs, target_source="tgt").collect()
    assert row["doc_id"] == 2
    assert row["n_tokens"] == 1
    assert math.isclose(row["dsir_logweight"], 0.0, abs_tol=1e-9)


def test_bpe_merges_counts_weighted_pairs(spark):
    from etl_gcp_spark.functions.text import bpe_merges

    # "abab" contributes pairs ab, ba, ab; appears twice -> ab:4 ba:2
    # "cd" (once) -> cd:1; "x" and "A9" filtered by the [a-z]{2,} gate
    docs = spark.createDataFrame(
        [(1, "abab abab cd x A9")], "doc_id long, text string"
    )
    out = {r["pair"]: r["merge_count"] for r in bpe_merges(docs).collect()}
    assert out == {"ab": 4, "ba": 2, "cd": 1}


def test_bpe_merges_deterministic_tiebreak(spark):
    from etl_gcp_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "zz aa zz aa")], "doc_id long, text string"
    )
    rows = bpe_merges(docs, top_k=1).collect()
    # aa and zz tie at 2 -> lexicographically smaller pair wins
    assert rows[0]["pair"] == "aa"


def test_incremental_near_dup_matches_exact_cross_pairs(spark, sf_dir):
    from etl_gcp_spark.operators.text_dedup import (
        incremental_near_dup_pairs,
        ngram_jaccard_pairs,
    )
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    batch = docs.filter("doc_id % 10 = 0")
    got = {
        (r["batch_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_near_dup_pairs(corpus, batch).collect()
    }
    # exact cross-set pairs = full exact pair set restricted to
    # one-side-in-batch; LSH banding must recall ALL of them here
    want = set()
    for r in ngram_jaccard_pairs(docs, threshold=0.8).collect():
        in1, in2 = r["id1"] % 10 == 0, r["id2"] % 10 == 0
        if in1 != in2:
            b, c = (r["id1"], r["id2"]) if in1 else (r["id2"], r["id1"])
            want.add((b, c, r["jaccard"]))
    assert got == want
    # and strictly no corpus-side self pairs
    for b, c, _ in got:
        assert b % 10 == 0 and c % 10 != 0


def test_winsorize_clamps_at_rounded_percentiles(spark):
    from etl_gcp_spark.operators.clean import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = {r["id"]: r["v_w"] for r in winsorize(df, "v").collect()}
    # exact p01 of 1..100 = 1.99, p99 = 99.01 (linear interpolation)
    assert out[1] == 1.99
    assert out[100] == 99.01
    assert out[50] == 50.0  # interior values untouched


def test_streaming_minhash_dedup_equals_batch_greedy(spark, sf_dir):
    import os

    from etl_gcp_spark.operators.text_dedup import near_dup_dedup
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_minhash_dedup

    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_id"], r["text"])
        for r in near_dup_dedup(docs).collect()
    }
    got = {
        (r["doc_id"], r["text"])
        for r in run_streaming_minhash_dedup(
            spark, os.path.join(sf_dir, "documents.parquet")
        ).collect()
    }
    # 4 incremental microbatches reproduce the batch greedy rule
    # exactly (id-ordered arrival)
    assert got == want


def test_contamination_bloom_equals_exact_screen(spark, sf_dir):
    from etl_gcp_spark.operators.corpus import (
        contamination_bloom,
        contamination_overlap,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r.doc_id, r.n_shared)
        for r in contamination_overlap(
            docs, benchmark_source="src0", min_shared=3
        ).collect()
    }
    bloom = {
        (r.doc_id, r.n_shared)
        for r in contamination_bloom(
            docs, benchmark_source="src0", min_shared=3
        ).collect()
    }
    # bloom prefilter has no false negatives and the verify join
    # removes false positives → exactly the exact screen's output
    assert bloom == exact and len(bloom) > 0


def test_contamination_bloom_tiny_filter_still_exact(spark, sf_dir):
    from etl_gcp_spark.operators.corpus import (
        contamination_bloom,
        contamination_overlap,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # pathologically small bitset → high FP rate → the verify join is
    # doing real work; output must STILL be exact
    bloom = {
        (r.doc_id, r.n_shared)
        for r in contamination_bloom(
            docs, benchmark_source="src0", min_shared=3, m_bits=512
        ).collect()
    }
    exact = {
        (r.doc_id, r.n_shared)
        for r in contamination_overlap(
            docs, benchmark_source="src0", min_shared=3
        ).collect()
    }
    assert bloom == exact


def test_seq_length_histogram_buckets_and_waste(spark):
    from etl_gcp_spark.operators.corpus import seq_length_histogram

    docs = spark.createDataFrame(
        [
            (1, " ".join(["t"] * 10)),   # -> 16
            (2, " ".join(["t"] * 16)),   # boundary -> 16
            (3, " ".join(["t"] * 17)),   # -> 32
            (4, " ".join(["t"] * 5000)),  # tail -> 2048
        ],
        "doc_id long, text string",
    )
    out = {r.bucket: r for r in seq_length_histogram(docs).collect()}
    assert out[16].n_docs == 2 and out[16].pad_waste == 32 - 26
    assert out[32].n_docs == 1 and out[32].pad_waste == 15
    # tail doc overflows the top edge: waste goes negative, flagging
    # that 2048 truncates rather than pads
    assert out[2048].pad_waste == 2048 - 5000


def test_source_quality_report_dup_share_and_invariance(spark):
    from etl_gcp_spark.operators.corpus import source_quality_report

    docs = spark.createDataFrame(
        [
            (1, "the fast row", "en", "a"),
            (2, "the fast row", "en", "a"),   # exact dup in a
            (3, "slow merge batch", "de", "a"),
            (4, "unique text here", "en", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.source: r for r in source_quality_report(docs).collect()}
    assert out["a"].n_docs == 3 and out["a"].dup_share == round(1 / 3, 6)
    assert out["a"].n_langs == 2
    assert out["b"].dup_share == 0.0
    # decimal quality sum -> partitioning cannot change the report
    re = {r.source: r for r in
          source_quality_report(docs.repartition(7)).collect()}
    assert re == out


def test_quality_quota_keeps_best_per_source(spark):
    from etl_gcp_spark.operators.corpus import quality_quota_filter

    # source a: clean doc + junky doc -> quota 1/2 keeps the clean;
    # source b: single doc always survives (ceil(0.5) = 1)
    docs = spark.createDataFrame(
        [
            (1, "clean readable words here", "x", "a"),
            (2, "@@!! ## $$ %% ^^ &&", "x", "a"),
            (3, "lonely source doc", "x", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    kept = {r.doc_id for r in quality_quota_filter(docs).collect()}
    assert kept == {1, 3}


def test_benchmark_coverage_fractions(spark):
    from etl_gcp_spark.operators.corpus import benchmark_coverage

    # bench doc 1: shingles {a b c, b c d} -- 'a b c' also appears in
    # corpus doc 10 -> coverage 1/2; bench doc 2 fully uncovered
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "src0"),
            (2, "x y z w", "src0"),
            (10, "a b c q", "src1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in benchmark_coverage(docs).collect()}
    assert out[1].n_shingles == 2 and out[1].n_covered == 1
    assert out[1].coverage == 0.5
    assert out[2].coverage == 0.0


def test_quality_pctile_calibrates_within_source(spark):
    from etl_gcp_spark.operators.corpus import quality_percentile_by_source

    # each source's best doc gets pctile 1.0 regardless of how its
    # raw score compares to the OTHER source's docs
    docs = spark.createDataFrame(
        [
            (1, "clean readable words here now", "x", "a"),
            (2, "@@!! ## $$ %%", "x", "a"),
            (3, "mostly words but some @@@@ junk", "x", "b"),
            (4, "#### $$$$ @@@@ !!!!", "x", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in
           quality_percentile_by_source(docs).collect()}
    assert out[1].quality_pctile == 1.0
    assert out[2].quality_pctile == 0.0
    # source b's best is pctile 1.0 even though its raw score is far
    # below source a's best
    best_b = max((out[3], out[4]), key=lambda r: r.quality_score)
    assert best_b.quality_pctile == 1.0
    assert best_b.quality_score < out[1].quality_score


def test_streaming_minhash_dedup_recovers_from_mid_stream_crash(
    spark, sf_dir, tmp_path
):
    """Kill the streaming dedup after trigger 2 of 4 (post-write,
    pre-commit), resume from the checkpoint, and require the survivor
    set to equal the batch greedy oracle EXACTLY — replayed batches
    must rewrite their own index/survivor slices idempotently."""
    import os

    import pytest

    from etl_gcp_spark.operators.text_dedup import near_dup_dedup
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_minhash_dedup

    root = str(tmp_path / "sdedup_recovery")
    path = os.path.join(sf_dir, "documents.parquet")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_minhash_dedup(
            spark, path, root=root, fail_after_batches=2
        )
    got = {
        (r["doc_id"], r["text"])
        for r in run_streaming_minhash_dedup(
            spark, path, root=root
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_id"], r["text"]) for r in near_dup_dedup(docs).collect()
    }
    assert got == want


def test_temperature_mixture_upweights_small_sources(spark):
    from etl_gcp_spark.operators.corpus import temperature_mixture_weights

    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    out = {r.source: r for r in temperature_mixture_weights(docs).collect()}
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-5
    # α=0.5 damps the dominant source and lifts the small one
    assert out["big"].weight < out["big"].nat_share
    assert out["small"].weight > out["small"].nat_share
    # sqrt(0.9)/ (sqrt(0.9)+sqrt(0.1)) ≈ 0.75, sqrt(0.1)/... ≈ 0.25
    assert abs(out["big"].weight - 0.75) < 0.01
    assert out["big"].expected_per_1000 + out["small"].expected_per_1000 in (
        999, 1000, 1001,
    )
