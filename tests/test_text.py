"""Text-analysis function contracts (training-data extensions)."""

from __future__ import annotations

from pyspark.sql import Row

from etl_gcp_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_token_count(spark):
    out = token_count(_docs(spark, ["a b  c", "one"])).collect()
    got = {r.doc_id: (r.n_tokens, r.n_chars_measured) for r in out}
    assert got[0] == (3, 6)  # double space collapses in \s+ split
    assert got[1] == (1, 3)


def test_fingerprint_canonicalizes(spark):
    out = fingerprint(_docs(spark, ["  Hello World ", "hello world", "other"]))
    fps = [r.fingerprint for r in out.orderBy("doc_id").collect()]
    assert fps[0] == fps[1] != fps[2]


def test_lang_id_argmax_and_tiebreak(spark):
    # doc 0: two 'en' markers -> en; doc 1: zero overlap everywhere ->
    # all scores tie at 0 -> alphabetical first ('de') wins
    out = lang_id(_docs(spark, ["the fast row", "zzz qqq"])).orderBy("doc_id")
    rows = out.collect()
    assert rows[0].predicted_lang == "en"
    assert rows[1].predicted_lang == sorted(LANG_MARKERS)[0]


def test_quality_score_features(spark):
    out = quality_score(_docs(spark, ["the a the a", "clean prose sample"]))
    rows = {r.doc_id: r for r in out.collect()}
    # doc 0 is all stopwords: stop_ratio 1.0 capped at 0.5 penalty
    assert rows[0].stopword_ratio == 1.0
    assert rows[0].quality_score < rows[1].quality_score
    assert rows[1].junk_ratio == 0.0


def test_winnow_fingerprints_invariants(spark):
    from etl_gcp_spark.functions.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(
        spark,
        [
            base,
            base,                               # identical
            base.replace("lazy", "hazy"),       # local edit
            "zz",                               # too short -> dropped
        ],
    )
    out = winnow_fingerprints(docs, k=8, window=4)
    fps = {}
    for r in out.collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert 3 not in fps                    # short doc filtered
    assert fps[0] == fps[1]                # identical docs, identical sets
    overlap = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert 0.3 < overlap < 1.0             # local edit: high but not full


def test_repetition_engines_agree_on_testdata(spark, sf_dir):
    # the Arrow kernel and the SQL-mirrorable Column form must be
    # value-identical (incl. HALF_UP 4-dp rounding on exact binary
    # halves like 2/64) — the condition under which the shared DuckDB
    # oracle covers the default engine
    from etl_gcp_spark.functions.text import repetition_signals
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    arrow = {tuple(r) for r in repetition_signals(docs).collect()}
    sql = {
        tuple(r) for r in repetition_signals(docs, engine="sql").collect()
    }
    assert arrow == sql
    assert arrow


def test_unigram_surprisal_orders_rarity(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.functions.text import unigram_surprisal

    # "common common common" vs a doc of hapaxes: rare tokens carry
    # more surprisal
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common common"),
            Row(doc_id=2, text="rare unique single tokens"),
        ]
    )
    got = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    assert got[1].n_tokens == 4 and got[2].n_tokens == 4
    assert got[2].mean_surprisal > got[1].mean_surprisal
    # exact values: P(common)=4/8 -> ln2; hapax -> ln8
    import math

    assert got[1].mean_surprisal == round(math.log(2), 4)
    assert got[2].mean_surprisal == round(math.log(8), 4)


def test_unigram_surprisal_ignores_null_text_docs(spark):
    # regression: explode_outer emitted a NULL pseudo-token for
    # NULL-text docs that inflated the corpus `total` (shifting every
    # mean) while the inner join dropped it — DuckDB's unnest drops
    # NULLs, so the frequency table must exclude them entirely
    import math

    from pyspark.sql import Row

    from etl_gcp_spark.functions.text import unigram_surprisal

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common common"),
            Row(doc_id=2, text="rare unique single tokens"),
            Row(doc_id=3, text=None),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    # NULL-text doc contributes no tokens and no output row
    assert set(got) == {1, 2}
    # values identical to the no-NULL corpus: total is still 8
    assert got[1].mean_surprisal == round(math.log(2), 4)
    assert got[2].mean_surprisal == round(math.log(8), 4)


def test_bigram_surprisal_penalizes_scrambled_order(spark):
    # two docs, same unigram bag, different order: the one reusing
    # the corpus's dominant bigrams scores LOWER surprisal; unigram
    # surprisal cannot separate them (identical bags)
    from pyspark.sql import Row

    from etl_gcp_spark.functions.text import (
        bigram_surprisal,
        unigram_surprisal,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b a b"),
            Row(doc_id=2, text="a a b b a a b b"),   # same bag, rarer bigrams
            Row(doc_id=3, text="a"),                 # 1 token: no bigram row
            Row(doc_id=4, text=None),                # NULL: no row
        ],
        "doc_id int, text string",
    )
    uni = {r.doc_id: r.mean_surprisal
           for r in unigram_surprisal(docs).collect()}
    assert uni[1] == uni[2]
    bi = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert set(bi) == {1, 2}
    assert bi[1].n_bigrams == 7 and bi[2].n_bigrams == 7
    assert bi[1].mean_surprisal < bi[2].mean_surprisal


def test_bpe_train_merges_greedy_and_deterministic(spark):
    """The merge loop is the paper's: most frequent adjacent pair
    first, lexicographic tiebreak, greedy LEFT-TO-RIGHT
    non-overlapping application ('aaaa' with pair (a,a) merges
    positions 1-2 and 3-4, never 2-3), merged symbols feed later
    rounds."""
    from etl_gcp_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa ab")], "doc_id long, text string"
    )
    rows = bpe_train_merges(docs, n_merges=3).orderBy("rank").collect()
    # pairs in 'aaaa' (x2 words): (a,a) at 3 positions each = 6;
    # 'ab' contributes (a,b)=1; plus </w> pairs. (a,a) wins round 1.
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "a")
    assert rows[0]["pair_count"] == 6
    # after greedy merge each 'aaaa' is [aa, aa, </w>]: (aa,aa)=2
    # ties with (aa,</w>)=2 -> lexicographic left tiebreak picks
    # ('aa','</w>') < ('aa','aa')? '</w>' < 'aa' lexicographically
    assert rows[1]["left_sym"] == "aa"
    assert rows[1]["right_sym"] == "</w>"
    assert rows[1]["pair_count"] == 2
    # double-run determinism
    again = bpe_train_merges(docs, n_merges=3).orderBy("rank").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_bpe_train_merges_stops_when_no_pairs_remain(spark):
    """A corpus whose words collapse to single symbols stops early
    instead of emitting null merges."""
    from etl_gcp_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "x x x")], "doc_id long, text string"
    )
    rows = bpe_train_merges(docs, n_merges=5).collect()
    # round 1 merges (x, </w>) -> words become single-symbol; no
    # adjacent pairs remain -> exactly one merge learned
    assert len(rows) == 1
    assert rows[0]["merged"] == "x</w>"


def test_bpe_segment_counts_hand_checked(spark):
    """Apply-side accounting on a hand-computable corpus: after the
    single (a,a) merge, 'aaaa' segments to [aa, aa, </w>] (3) and
    'ab' to [a, b, </w>] (3)."""
    from etl_gcp_spark.functions.text import bpe_segment_counts

    docs = spark.createDataFrame(
        [(1, "aaaa ab"), (2, "aaaa")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in bpe_segment_counts(docs, n_merges=1).collect()
    }
    assert out == {1: (2, 6), 2: (1, 3)}


def test_bpe_segment_counts_survives_merge_exhaustion(spark, tmp_path):
    """When merges run dry before n_merges, the final segmentation
    must still cover every word (Spark: loop break keeps the last
    frame; oracle: the NOT-EXISTS fallback branch carries S{i}
    forward) — verified on BOTH engines over an exhausting corpus."""
    import duckdb

    import __spark_entry__ as entrymod
    from etl_gcp_spark.functions.text import bpe_segment_counts

    docs = spark.createDataFrame(
        [(1, "x x"), (2, "x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in bpe_segment_counts(docs, n_merges=5).collect()
    }
    # one merge (x, </w>) then exhaustion: every 'x' is 1 subword
    assert got == {1: (2, 2), 2: (1, 1)}
    pq = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(
            entrymod.oracle_sql()["bpe_segment_counts"]
        ).fetchall()
    }
    assert oracle == got


def test_bpe_train_merges_empty_corpus_returns_empty(spark):
    from etl_gcp_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train_merges(docs, n_merges=3).count() == 0
