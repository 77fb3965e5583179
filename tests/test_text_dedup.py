"""Document-dedup operator contracts: exact, Jaccard, MinHash, SimHash.

Crafted corpora with known duplicate structure; MinHash-LSH recall is
checked against the exact Jaccard baseline (the subset contract from
the docstring).
"""

from __future__ import annotations

from pyspark.sql import Row

from etl_gcp_spark.operators.text_dedup import (
    exact_text_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    with_shingles,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = BASE.replace("today", "tonight")  # 1-word edit => high jaccard
OTHER = "completely different content about database engines and storage layers"


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE),
            Row(doc_id=2, text=BASE),        # exact dup of 1
            Row(doc_id=3, text=NEAR),        # near dup of 1
            Row(doc_id=4, text=OTHER),
            Row(doc_id=5, text="too short"), # < 3 tokens: no shingles
        ]
    )


def test_with_shingles_drops_short_docs(spark):
    sh = with_shingles(_docs(spark))
    ids = {r.doc_id for r in sh.collect()}
    assert ids == {1, 2, 3, 4}
    row = sh.filter("doc_id = 1").collect()[0]
    # 15 tokens -> 13 trigrams, minus repeated ones (array_distinct)
    assert 1 < len(row.shingles) <= 13
    assert "the quick brown" in row.shingles


def test_exact_text_dedup_keeps_min_id(spark):
    kept = {r.doc_id for r in exact_text_dedup(_docs(spark)).collect()}
    assert kept == {1, 3, 4, 5}  # doc 2 collapses into doc 1


def test_ngram_jaccard_finds_exact_and_near(spark):
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_signatures_shape_and_identity(spark):
    sigs = minhash_signatures(_docs(spark), num_perm=16)
    assert sigs.columns == ["doc_id"] + [f"h{i}" for i in range(16)]
    rows = {r.doc_id: tuple(r)[1:] for r in sigs.collect()}
    assert rows[1] == rows[2]       # identical docs -> identical signature
    assert rows[1] != rows[4]


def test_minhash_lsh_recall_vs_exact(spark):
    exact = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    }
    # verified candidates are a subset of true pairs; the j=1.0 pair
    # MUST be recalled (identical signatures share every band)
    assert lsh <= exact
    assert (1, 2) in lsh


def test_minhash_lsh_full_recall_on_testdata(spark, sf_dir):
    # locks the oracle-validity claim for the LSH-backed registry
    # entries (minhash_lsh_pairs / near_dup_dedup / dedup_clusters):
    # the banded generator recalls EVERY exact pair on the driver's
    # corpus, so the exact-Jaccard DuckDB oracle applies to the LSH
    # path. Deterministic — signatures are xxhash64 of fixed data.
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id1, r.id2, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.id1, r.id2, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert lsh == exact
    assert exact  # non-vacuous: the corpus does contain near-dups


def test_simhash_identity_and_pairs(spark):
    fp = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert fp[1] == fp[2]
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in simhash_pairs(_docs(spark), max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_near_dup_dedup_warns_below_banding_midpoint(spark):
    import warnings

    from pyspark.sql import Row

    from etl_gcp_spark.operators.text_dedup import near_dup_dedup

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g h")], "doc_id int, text string"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        near_dup_dedup(docs, threshold=0.5)  # below ~0.63 midpoint
        assert any("recall" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        near_dup_dedup(docs, threshold=0.8)  # default regime: silent
        near_dup_dedup(docs, threshold=0.5, use_lsh=False)  # exact: silent
        assert not caught


def test_containment_catches_embedded_doc(spark):
    from pyspark.sql import Row as _Row

    from etl_gcp_spark.operators.text_dedup import containment_pairs

    long_doc = " ".join(f"w{i}" for i in range(100))
    short_doc = " ".join(f"w{i}" for i in range(40, 60))  # embedded slice
    other = " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame(
        [
            _Row(doc_id=1, text=long_doc),
            _Row(doc_id=2, text=short_doc),
            _Row(doc_id=3, text=other),
        ]
    )
    out = containment_pairs(df, threshold=0.9).collect()
    assert [(r.id1, r.id2) for r in out] == [(1, 2)]
    assert out[0].containment == 1.0  # fully contained
    # Jaccard of the same pair is tiny: 18/(98+18-18) -> would never
    # clear a 0.9 Jaccard bar; containment is the signal that sees it


def test_containment_df_cap_drops_ubiquitous_shingles(spark):
    from pyspark.sql import Row as _Row

    from etl_gcp_spark.operators.text_dedup import containment_pairs

    # every doc shares one ubiquitous phrase; with max_df below the
    # corpus size the phrase is dropped and no pair survives
    rows = [
        _Row(doc_id=i, text=f"the same header everywhere u{i} v{i} w{i}")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    # shared shingles: "the same header", "same header everywhere" —
    # 2 of each doc's 5; containment with the cap ON is 0 (no shared
    # sub-cap shingle), with the cap lifted it's 2/5 = 0.4
    assert containment_pairs(df, threshold=0.3, max_df=5).count() == 0
    assert containment_pairs(df, threshold=0.3, max_df=100).count() > 0


def test_shingle_cosine_weighs_repeats(spark):
    from etl_gcp_spark.operators.text_dedup import shingle_cosine_pairs

    # doc 1 and doc 2 share their full shingle SET, but doc 2 repeats
    # the phrase 3x -> multiset cosine < 1 while Jaccard would be 1;
    # doc 3 is an exact copy of doc 1 -> cosine == 1.
    phrase = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(1, phrase), (2, " ".join([phrase] * 3)), (3, phrase)],
        "doc_id long, text string",
    )
    rows = {
        (r.id1, r.id2): r.cosine
        for r in shingle_cosine_pairs(
            docs, threshold=0.1, max_df=10
        ).collect()
    }
    assert rows[(1, 3)] == 1.0
    assert 0.1 < rows[(1, 2)] < 1.0
    assert rows[(1, 2)] == rows[(2, 3)]


def test_shingle_cosine_df_cap_is_semantics(spark):
    from etl_gcp_spark.operators.text_dedup import shingle_cosine_pairs

    # a shingle present in every doc is dropped by the cap, taking the
    # only overlap with it: no pairs survive
    docs = spark.createDataFrame(
        [(i, f"common one two uniq{i} x{i} y{i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = shingle_cosine_pairs(docs, threshold=0.01, max_df=4)
    assert out.count() == 0


def test_ngram_novelty_prefix_coverage(spark):
    from etl_gcp_spark.operators.text_dedup import ngram_novelty

    # doc 1 all-novel; doc 2 = copy of doc 1 (novelty 0);
    # doc 3 = half doc-1 material, half fresh
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "a b c x y z w"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    # doc 3: shingles {abc, bcx, cxy, xyz, yzw}; only 'a b c' seen
    assert out[3].n_shingles == 5 and out[3].n_novel == 4


def test_canonical_dedup_gain_counts_normalization_dups(spark):
    from etl_gcp_spark.operators.text_dedup import canonical_dedup_gain

    docs = spark.createDataFrame(
        [
            (1, "hello  world"),   # ragged spacing
            (2, "hello world"),    # canonical twin of 1
            (3, "hello world"),    # raw dup of 2
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    row = canonical_dedup_gain(docs).collect()[0]
    assert row.n_docs == 4
    assert row.raw_distinct == 3       # 1 vs {2,3} vs 4
    assert row.canonical_distinct == 2
    assert row.gained_dups == 1


def test_jaccard_threshold_curve_bands(spark):
    from etl_gcp_spark.operators.text_dedup import jaccard_threshold_curve

    # identical pair (jaccard 1.0) + a pair around 0.6-0.65
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),
            (3, "a b c d e f g x y z"),
        ],
        "doc_id long, text string",
    )
    out = {r.band_lo: r.n_pairs for r in
           jaccard_threshold_curve(docs, floor=0.3).collect()}
    assert out[1.0] == 1
    assert sum(out.values()) >= 2  # the near pair lands in some band
    assert all(b >= 0.3 for b in out)


def test_cross_doc_passage_share(spark):
    from etl_gcp_spark.operators.text_dedup import cross_doc_passage_share

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1a unique1b"),
            (2, shared + " other2a other2b"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           cross_doc_passage_share(docs, window=8).collect()}
    # docs 1/2: 3 windows each, only the first (the shared passage)
    # appears in the other doc
    assert out[1].n_passages == 3 and out[1].n_shared == 1
    assert out[2].n_shared == 1
    assert out[3].n_shared == 0


def test_substring_dedup_rewrite_semantics(spark):
    """Keeper (lowest doc_id) keeps the shared passage; every later
    holder loses exactly the covered tokens; unique text and sub-k
    documents pass through verbatim."""
    from etl_gcp_spark.operators.text_dedup import substring_dedup_rewrite

    shared = "one two three four five six seven eight"          # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro {shared} outro alpha beta gamma delta"),
            (2, f"prefix words here {shared} and a unique tail x"),
            (3, "totally unrelated text with eight sole tokens"),
            (4, shared),                      # exactly the passage
            (5, "short doc"),                 # < k tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_rewrite(docs, k=8).collect()}
    assert out[1].cleaned_text == docs.filter("doc_id=1").first().text
    assert out[1].n_removed == 0
    assert out[2].cleaned_text == "prefix words here and a unique tail x"
    assert out[2].n_removed == 8
    assert out[3].n_removed == 0
    assert out[4].cleaned_text == "" and out[4].n_removed == 8
    assert out[5].cleaned_text == "short doc" and out[5].n_removed == 0
    assert all(r.n_tokens > 0 for r in out.values())


def test_substring_dedup_rewrite_overlapping_spans_merge(spark):
    """Two overlapping duplicated 8-gram occurrences cover a 9-token
    union — covered indexes dedup, not double-count."""
    from etl_gcp_spark.operators.text_dedup import substring_dedup_rewrite

    nine = "a b c d e f g h i"   # both 8-grams (1..8) and (2..9) shared
    docs = spark.createDataFrame(
        [(1, f"{nine} filler tokens here"), (2, f"{nine} other suffix")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup_rewrite(docs, k=8).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == 9
    assert out[2].cleaned_text == "other suffix"


def test_lsh_recall_report_contract(spark):
    from etl_gcp_spark.operators.text_dedup import lsh_recall_report

    # identical pair (jaccard 1.0, MUST be found: identical signatures
    # collide in every band), a mid-similarity pair, and an unrelated
    # doc that must stay below the floor entirely
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "a b c d e f g h i j k l"),
            (3, "a b c d e f g h x y z w"),
            (4, "p q r s t u v nope none here at"),
        ],
        "doc_id long, text string",
    )
    rows = {r.band_lo: r for r in
            lsh_recall_report(docs, floor=0.3).collect()}
    assert rows, "no bands reported"
    top = rows[1.0]
    # exact duplicates are banding's guaranteed case
    assert top.n_pairs == 1 and top.n_found == 1 and top.recall == 1.0
    for r in rows.values():
        assert 0 <= r.n_found <= r.n_pairs
        assert 0.0 <= r.recall <= 1.0
        assert r.band_lo >= 0.3
    # the unrelated doc forms no pair above the floor with anything
    assert sum(r.n_pairs for r in rows.values()) <= 3


def test_with_shingles_survives_sub_n_docs_in_fused_pipeline(spark):
    """Whole-stage-codegen CSE can evaluate the shingle transform
    inside the size>=n filter's stage — on the sub-n rows the filter
    is about to drop — so the window expression must be TOTAL: a
    2-token document in the corpus must not crash a downstream
    explode/dedup pipeline (it did, review r9), and the shingles of
    valid documents are unchanged."""
    from pyspark.sql import functions as F

    from etl_gcp_spark.operators.text_dedup import with_shingles

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (4, "hi there")],
        "doc_id long, text string",
    )
    got = sorted(
        r["g"]
        for r in with_shingles(docs.filter(F.col("doc_id") == 0))
        .select(F.explode("shingles").alias("g"))
        .dropDuplicates()
        .collect()
    )
    assert got == ["alpha beta gamma", "beta gamma delta"]
    # and the mixed frame end-to-end: sub-n doc simply has no rows
    mixed = {
        r["doc_id"]: sorted(r["shingles"])
        for r in with_shingles(docs).collect()
    }
    assert set(mixed) == {0}
