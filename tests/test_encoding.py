"""Feature-prep encoders, Markov transitions, correlation matrix,
chi2 selection — semantics against hand-computed / numpy references."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_gcp_spark.operators.encoding import (
    HASH_PRIME,
    hashed_feature_stats,
    hashed_features,
    target_encode,
)


def test_target_encode_shrinks_toward_prior(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 100.0), (None, 40.0), ("c", None)],
        "cat string, y double",
    )
    out = {r.category: r for r in target_encode(df, "cat", "y", smoothing=2.0).collect()}
    # NULL target excluded entirely: 'c' has no surviving rows
    assert "c" not in out
    # NULL category is a real encoding row
    assert out[None].n_rows == 1
    prior = (10 + 20 + 100 + 40) / 4  # 42.5
    assert out["a"].cat_mean == 15.0
    assert out["a"].enc == round((30 + 2 * prior) / (2 + 2), 4)
    assert out["b"].enc == round((100 + 2 * prior) / (1 + 2), 4)
    # shrinkage: rare category pulled toward the prior
    assert out["a"].enc > out["a"].cat_mean
    assert out["b"].enc < out["b"].cat_mean


def _py_hash(tok: str) -> int:
    h = 0
    for i, ch in enumerate(tok[:8]):
        h += ord(ch) * 31**i
    return h % HASH_PRIME


def test_hashed_features_match_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "scan merge"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.feat_idx): r.weight
        for r in hashed_features(docs, dim=64).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for doc_id, text in [(1, "spark spark join"), (2, "scan merge")]:
        for tok in text.split():
            h = _py_hash(tok)
            sign = 1 if (h // 64) % 2 == 0 else -1
            k = (doc_id, h % 64)
            want[k] = want.get(k, 0) + sign
    assert got == want
    assert all(0 <= idx < 64 for _, idx in got)


def test_hashed_feature_stats_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = hashed_features(docs, dim=64)
    stats = hashed_feature_stats(docs, dim=64)
    a = per_doc.agg(F.sum("weight")).first()[0]
    b = stats.agg(F.sum("net_weight")).first()[0]
    assert a == b
    n_tokens = stats.agg(F.sum("n_tokens")).first()[0]
    exact = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    ).filter(F.length("t") > 0).count()
    assert n_tokens == exact


def test_markov_transitions_counts_and_rows(spark):
    from etl_gcp_spark.operators.events import markov_transitions

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a
        (1, t0, 1, "a"),
        (2, t0 + datetime.timedelta(minutes=1), 1, "b"),
        (3, t0 + datetime.timedelta(minutes=2), 1, "a"),
        # user 2: a -> b
        (4, t0, 2, "a"),
        (5, t0 + datetime.timedelta(minutes=1), 2, "b"),
        # NULL ts and NULL user excluded
        (6, None, 1, "zzz"),
        (7, t0, None, "zzz"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.prev_type, r.event_type): (r.n_transitions, r.p)
        for r in markov_transitions(ev).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_markov_probabilities_sum_to_one(spark, sf_dir):
    from etl_gcp_spark.operators.events import markov_transitions

    ev = spark.read.format("parquet").load(
        f"{sf_dir}/events.parquet"
    )  # ts is int64-nanos here; cast like the loader does
    ev = ev.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ) if dict(ev.dtypes)["ts"] == "bigint" else ev
    sums = (
        markov_transitions(ev)
        .groupBy("prev_type")
        .agg(F.round(F.sum("p"), 4).alias("s"))
        .collect()
    )
    for r in sums:
        # per-row 6-dp rounding keeps the row sum within 1e-4 of 1
        assert abs(r.s - 1.0) < 1e-3


def test_corr_matrix_exact_and_vs_numpy(spark):
    np = pytest.importorskip("numpy")
    from etl_gcp_spark.operators.quality import numeric_corr_matrix

    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(0, 100, 500), 2)
    y = np.round(3 * x + 5, 2)          # corr exactly 1
    z = np.round(rng.uniform(0, 9, 500), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r.col_x, r.col_y): r.corr
        for r in numeric_corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert got[("x", "y")] == 1.0
    # int64-cents exactness: compare against numpy on the same cents
    cx = np.round(x * 100).astype(np.int64)
    cz = np.round(z * 100).astype(np.int64)
    want = np.corrcoef(cx, cz)[0, 1]
    assert abs(got[("x", "z")] - want) < 1e-6


def test_corr_matrix_constant_column_null(spark):
    from etl_gcp_spark.operators.quality import numeric_corr_matrix

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    [r] = numeric_corr_matrix(df, ["x", "y"]).collect()
    assert r.corr is None  # zero variance -> undefined, not Inf/NaN


def test_chi2_planted_token_ranks_first(spark):
    from etl_gcp_spark.operators.classifier import chi2_feature_selection

    rows = []
    for i in range(40):
        lab = "en" if i % 2 == 0 else "de"
        planted = "signal" if lab == "en" else "noise"
        rows.append((i, f"common filler {planted}", lab))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_feature_selection(
        docs, label=F.col("lang") == "en", min_df=5, k=4
    ).collect()
    assert {out[0].token, out[1].token} == {"signal", "noise"}
    assert out[0].chi2 == 40.0  # perfect 2x2 split: chi2 = N
    # a token present in EVERY doc carries no signal: guard lands 0
    allpresent = {r.token: r.chi2 for r in out}
    assert allpresent["common"] == 0.0
    assert allpresent["filler"] == 0.0


def test_analyze_table_stats_exact_and_ndv(spark):
    from etl_gcp_spark.operators.quality import analyze_table_stats

    rows = [(i, float(i % 10), None if i % 5 == 0 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, m double, s double")
    out = {r.col_name: r for r in analyze_table_stats(df, ["k", "m", "s"]).collect()}
    assert out["k"].n_rows == 1000 and out["k"].n_nulls == 0
    assert out["m"].min_val == 0.0 and out["m"].max_val == 9.0
    assert out["s"].n_nulls == 200
    # exact small-range regime: 10 distinct -> linear counting is tight
    assert abs(out["m"].ndv_est - 10) < 1.0
    # 1000 distinct on m=128 registers: HLL error ~ 1.04/sqrt(128) ~ 9%
    assert abs(out["k"].ndv_est - 1000) / 1000 < 0.3


def test_ewma_fold_matches_python(spark):
    from etl_gcp_spark.operators.events import ewma_by_user

    t0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, 20.0, 40.0, 8.0]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, v)
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    [r] = ewma_by_user(ev).collect()
    acc = vals[0]
    for v in vals[1:]:
        acc = 0.5 * v + 0.5 * acc
    assert r.ewma == round(acc, 6)
    assert r.n_used == 4 and r.last_value == 8.0


def test_ewma_recency_cap(spark):
    from etl_gcp_spark.operators.events import ewma_by_user

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, float(i))
        for i in range(100)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    [r] = ewma_by_user(ev, last_n=64).collect()
    assert r.n_used == 64
    acc = 36.0  # values 36..99 survive the cap
    for v in range(37, 100):
        acc = 0.5 * v + 0.5 * acc
    assert r.ewma == round(acc, 6)


def test_trend_report_monotone_series(spark):
    from etl_gcp_spark.operators.events import trend_report

    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for wk in range(6):  # strictly rising weekly counts: 1,2,...,6
        for j in range(wk + 1):
            rows.append((eid, t0 + datetime.timedelta(weeks=wk, hours=j)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    [r] = trend_report(ev).collect()
    assert r.n_weeks == 6
    assert r.s_stat == 15  # all 15 pairs increasing
    # counts rise by exactly 1/week: every pairwise slope is 1.0
    assert r.theil_sen_slope == 1.0
    assert r.z_mk > 2.0  # strong upward trend


def test_trend_report_flat_series_zero(spark):
    from etl_gcp_spark.operators.events import trend_report

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (wk * 10 + j, t0 + datetime.timedelta(weeks=wk, hours=j))
        for wk in range(5)
        for j in range(3)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    [r] = trend_report(ev).collect()
    assert r.s_stat == 0 and r.z_mk == 0.0
    assert r.theil_sen_slope == 0.0


def test_seasonality_shares_sum_to_one(spark):
    from etl_gcp_spark.operators.events import seasonality_profile

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=i), 1, "a" if i % 2 else "b")
        for i in range(48)
    ] + [(99, None, 1, "a")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = seasonality_profile(ev).collect()
    assert sum(r.n_events for r in out) == 48  # NULL ts excluded
    by_type: dict[str, float] = {}
    for r in out:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + r.share
    for s in by_type.values():
        assert abs(s - 1.0) < 1e-4


def test_fd_violation_report(spark):
    from etl_gcp_spark.operators.quality import fd_violation_report

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, None), (None, "z")],
        "k long, v string",
    )
    [r] = fd_violation_report(df, "k", "v").collect()
    assert r.n_keys == 3  # NULL lhs excluded
    assert r.n_violating == 1  # only key 2 maps to two values
    assert r.max_rhs_per_key == 2
    assert r.violation_rate == round(1 / 3, 6)


def test_equi_depth_histogram_buckets(spark):
    from etl_gcp_spark.operators.quality import equi_depth_histogram

    rows = [(float(v), v, 0) for v in range(160)]
    df = spark.createDataFrame(rows, "v double, k long, s long")
    out = sorted(
        equi_depth_histogram(df, "v", ["k", "s"], n_buckets=16).collect()
    )
    assert len(out) == 16
    assert all(r.n_rows == 10 for r in out)  # perfectly equal depth
    # buckets tile the domain in order without overlap
    for a, b in zip(out, out[1:]):
        assert a.hi < b.lo
    assert out[0].lo == 0.0 and out[-1].hi == 159.0


def test_range_selectivity_exact_on_boundaries(spark):
    from etl_gcp_spark.operators.quality import range_selectivity_report

    rows = [(float(v), v, 0) for v in range(160)]
    df = spark.createDataFrame(rows, "v double, k long, s long")
    [r] = range_selectivity_report(
        df, "v", ["k", "s"], lo=0.0, hi=159.0, n_buckets=16
    ).collect()
    # whole-domain predicate: every bucket fully covered, est exact
    assert r.est_rows == 160.0 and r.true_rows == 160
    [r2] = range_selectivity_report(
        df, "v", ["k", "s"], lo=40.0, hi=79.0, n_buckets=16
    ).collect()
    assert r2.true_rows == 40
    # uniform data: interpolation error well under one bucket of rows
    assert abs(r2.est_rows - 40.0) <= 10.0


def test_streaming_markov_recovers_and_equals_batch(spark, sf_dir, tmp_path):
    from etl_gcp_spark.operators.events import markov_transitions
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_markov

    events = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "smkv_recovery")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_markov(
            spark, events, root=root, fail_after_batches=2
        )
    streamed = {
        (r.prev_type, r.event_type): (r.n_transitions, r.p)
        for r in run_streaming_markov(spark, events, root=root).collect()
    }
    batch = {
        (r.prev_type, r.event_type): (r.n_transitions, r.p)
        for r in markov_transitions(events).collect()
    }
    # time-cut staging preserves per-user order; boundary state
    # supplies the cross-batch transitions — exact equality, counts
    # AND probabilities
    assert streamed == batch


def test_session_rules_perfect_cooccurrence(spark):
    from etl_gcp_spark.operators.events import session_rules

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 6 sessions (one per user), each containing both 'x' and 'y';
    # 3 extra sessions with only 'z'
    for u in range(6):
        rows.append((eid, t0, u, "x")); eid += 1
        rows.append((eid, t0 + datetime.timedelta(minutes=1), u, "y")); eid += 1
    for u in range(10, 13):
        rows.append((eid, t0, u, "z")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = session_rules(ev, min_pair=2).collect()
    [r] = [r for r in out if (r.type_a, r.type_b) == ("x", "y")]
    assert r.n_pair == 6
    assert r.support == round(6 / 9, 6)
    assert r.confidence_a_to_b == 1.0  # every x-session also has y
    assert r.lift == round(6 * 9 / (6 * 6), 6)  # 1.5: above chance


def test_bm25_index_serve_equals_fused(spark, sf_dir, tmp_path):
    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        bm25_topk,
        poly_hash_py,
        text_index_build,
    )
    from etl_gcp_spark.operators.encoding import _poly_hash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "textidx")
    text_index_build(docs, idx, n_buckets=64)
    served = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(
            spark, idx, ["spark", "vector", "stream"], k=10
        ).collect()
    ]
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(
            docs, ["spark", "vector", "stream"], k=10
        ).collect()
    ]
    assert served == fused  # bit-equal scores, identical ranking
    # the python bucket planner agrees with the Spark-side hash
    got = (
        spark.createDataFrame(
            [("spark",), ("vector",), ("stream",)], "t string"
        )
        .select(_poly_hash(F.col("t")).alias("h"))
        .collect()
    )
    toks = ["spark", "vector", "stream"]
    assert [r.h for r in got] == [poly_hash_py(t) for t in toks]


def test_bm25_filtered_serve_equals_fused_over_subcorpus(
    spark, sf_dir, tmp_path
):
    """The filtered-retrieval contract: serving with doc_pred from a
    meta-enriched index is bit-equal to the fused scorer over the
    filtered document set (sub-corpus df/n_docs/avgdl), and the
    unfiltered serve over the SAME enriched artifact still equals the
    fused full-corpus scorer (meta columns ride along inertly)."""
    from etl_gcp_spark.functions.text import (
        bm25_index_filtered_topk,
        bm25_index_topk,
        bm25_topk,
        text_index_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "textfidx")
    text_index_build(docs, idx, n_buckets=64, meta_cols=("lang",))
    terms = ["spark", "vector", "stream"]
    served = [
        (r.doc_id, r.bm25)
        for r in bm25_index_filtered_topk(
            spark, idx, terms, doc_pred=(F.col("lang") == "en"), k=10
        ).collect()
    ]
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(
            docs.filter(F.col("lang") == "en"), terms, k=10
        ).collect()
    ]
    assert served and served == fused
    unfiltered = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, k=10).collect()
    ]
    full = [
        (r.doc_id, r.bm25) for r in bm25_topk(docs, terms, k=10).collect()
    ]
    assert unfiltered == full


def test_text_index_erasure_serves_remaining_and_compact_is_physical(
    spark, sf_dir, tmp_path
):
    """The erasure lifecycle: (1) tombstone serve is bit-equal to the
    fused scorer over the corpus minus the erased docs (stats
    recomputed from survivors); (2) compaction makes it physical —
    erased ids gone from postings AND doclen, stats shrunk, tombstone
    dir cleared; (3) the post-compaction serve is unchanged."""
    import os

    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        bm25_topk,
        text_index_build,
        text_index_compact,
        text_index_erase,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "textedx")
    text_index_build(docs, idx, n_buckets=64)
    erased_pred = F.col("doc_id") % 7 == 0
    text_index_erase(spark, idx, docs.filter(erased_pred).select("doc_id"))
    terms = ["spark", "vector", "stream"]
    served = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, k=10).collect()
    ]
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(docs.filter(~erased_pred), terms, k=10).collect()
    ]
    assert served and served == fused
    n_docs_before = spark.read.parquet(f"{idx}/doclen").count()
    text_index_compact(spark, idx, n_buckets=64)
    assert not os.path.isdir(f"{idx}/tombstones")
    post = spark.read.parquet(f"{idx}/postings")
    assert post.filter(F.col("doc_id") % 7 == 0).count() == 0
    dl = spark.read.parquet(f"{idx}/doclen")
    assert dl.filter(F.col("doc_id") % 7 == 0).count() == 0
    assert dl.count() < n_docs_before
    stats = spark.read.parquet(f"{idx}/stats").collect()[0]
    assert stats["n_docs"] == dl.count()
    after = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, k=10).collect()
    ]
    assert after == served


def test_streaming_text_erasure_recovers_and_equals_batch(
    spark, sf_dir, tmp_path
):
    """Kill the deletion-request stream after trigger 2 of 4
    (post-write, pre-commit), resume from the checkpoint, and require
    the final serve to equal the fused scorer over the survivors —
    tombstone slices are batch_id-keyed overwrites, and the
    marker-guarded index build must NOT rerun on resume (a rebuild
    clears the tombstone dir and would silently drop the committed
    deletion slices the checkpoint will never replay)."""
    import os

    import pytest

    from etl_gcp_spark.functions.text import bm25_topk
    from etl_gcp_spark.streaming.text import run_streaming_text_erasure

    root = str(tmp_path / "text_erasure_recovery")
    path = os.path.join(sf_dir, "documents.parquet")
    terms = ["spark", "vector", "stream"]
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_text_erasure(
            spark, path, terms, root=root, fail_after_batches=2
        )
    # the committed slices must survive the crash into the resume
    assert os.path.isdir(f"{root}/index/tombstones")
    streamed = [
        (r.doc_id, r.bm25)
        for r in run_streaming_text_erasure(
            spark, path, terms, root=root
        ).collect()
    ]
    docs = spark.read.parquet(path)
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(
            docs.filter(F.col("doc_id") % 7 != 0), terms, k=10
        ).collect()
    ]
    assert streamed and streamed == fused


def test_filtered_serve_composes_with_erasure(spark, sf_dir, tmp_path):
    """Filter × erasure composition: a filtered serve on a tombstoned
    index must equal the fused scorer over documents that satisfy the
    predicate AND survive the erasure — both reductions apply to
    postings, doclen, and the recomputed stats."""
    from etl_gcp_spark.functions.text import (
        bm25_index_filtered_topk,
        bm25_topk,
        text_index_build,
        text_index_erase,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "textfe")
    text_index_build(docs, idx, n_buckets=64, meta_cols=("lang",))
    text_index_erase(
        spark, idx, docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    )
    terms = ["spark", "vector", "stream"]
    served = [
        (r.doc_id, r.bm25)
        for r in bm25_index_filtered_topk(
            spark, idx, terms, doc_pred=(F.col("lang") == "en"), k=10
        ).collect()
    ]
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(
            docs.filter(
                (F.col("lang") == "en") & (F.col("doc_id") % 7 != 0)
            ),
            terms,
            k=10,
        ).collect()
    ]
    assert served and served == fused


def test_text_index_append_equals_full_build(spark, sf_dir, tmp_path):
    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        text_index_append,
        text_index_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full_idx = str(tmp_path / "full")
    grown_idx = str(tmp_path / "grown")
    text_index_build(docs, full_idx)
    text_index_build(docs.filter(F.col("doc_id") % 2 == 0), grown_idx)
    text_index_append(docs.filter(F.col("doc_id") % 2 == 1), grown_idx)
    q = ["spark", "vector", "stream"]
    a = [(r.doc_id, r.bm25) for r in bm25_index_topk(spark, full_idx, q).collect()]
    b = [(r.doc_id, r.bm25) for r in bm25_index_topk(spark, grown_idx, q).collect()]
    assert a == b  # append-grown index serves identically to a full build


def test_text_index_append_meta_cols_mismatch_fails_fast(
    spark, sf_dir, tmp_path
):
    """meta_cols must match the build's in both directions — a
    mixed-schema postings/doclen tree breaks filtered serves, so the
    append guards on the base doclen schema (text twin of the
    ivf_index_append guard, ADVICE r7)."""
    import pytest

    from etl_gcp_spark.functions.text import text_index_append, text_index_build

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = str(tmp_path / "plainidx")
    text_index_build(docs.filter(F.col("doc_id") % 2 == 0), plain)
    with pytest.raises(ValueError, match="meta_cols mismatch"):
        text_index_append(
            docs.filter(F.col("doc_id") % 2 == 1), plain, meta_cols=("lang",)
        )
    enriched = str(tmp_path / "metaidx")
    text_index_build(
        docs.filter(F.col("doc_id") % 2 == 0), enriched, meta_cols=("lang",)
    )
    with pytest.raises(ValueError, match="meta_cols mismatch"):
        text_index_append(docs.filter(F.col("doc_id") % 2 == 1), enriched)


def test_text_index_compact_preserves_serving_and_shrinks_files(
    spark, sf_dir, tmp_path
):
    import glob

    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        text_index_append,
        text_index_build,
        text_index_compact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "cidx")
    text_index_build(docs.filter(F.col("doc_id") % 2 == 0), idx)
    text_index_append(docs.filter(F.col("doc_id") % 2 == 1), idx)
    q = ["spark", "vector", "stream"]
    before = [(r.doc_id, r.bm25) for r in bm25_index_topk(spark, idx, q).collect()]
    n_files_before = len(glob.glob(f"{idx}/postings/bucket=*/*.parquet"))
    text_index_compact(spark, idx)
    after = [(r.doc_id, r.bm25) for r in bm25_index_topk(spark, idx, q).collect()]
    n_files_after = len(glob.glob(f"{idx}/postings/bucket=*/*.parquet"))
    assert before == after  # bytes moved, semantics identical
    assert n_files_after < n_files_before  # ~1 file per bucket
    n_dirs = len(glob.glob(f"{idx}/postings/bucket=*"))
    assert n_files_after == n_dirs


def test_target_encode_oof_excludes_own_fold(spark):
    from etl_gcp_spark.operators.encoding import target_encode_oof

    # keys 0..9 -> folds via lehmer hash; category 'a' everywhere,
    # so each fold's encoding must be the mean of the OTHER folds
    rows = [(i, "a", float(100 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, cat string, y double")
    out = target_encode_oof(
        df, "cat", "y", "k", k=2, smoothing=0.0
    ).collect()
    # reproduce folds in python
    folds = {i: ((i * 48271) % 2147483647) % 10000 % 2 for i in range(10)}
    for r in out:
        other = [100 * i for i in range(10) if folds[i] != r.fold]
        assert r.enc_oof == round(sum(other) / len(other), 4)
    # leakage check: in-fold rows never contribute to their own cell
    assert {r.fold for r in out} == {0, 1}


def test_text_index_resize_preserves_serving_and_guards_count(
    spark, sf_dir, tmp_path
):
    """Resizing the postings partition function (64 -> 128 buckets)
    must not change served results (BM25 is bucket-invariant), must
    make pending tombstones physical in the same rebuild, and must
    make the OLD bucket count unusable afterward — a mismatched count
    would misroute appends and probes silently."""
    import glob
    import os

    import pytest

    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        bm25_topk,
        text_index_append,
        text_index_build,
        text_index_erase,
        text_index_resize,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "rszidx")
    terms = ["spark", "vector", "stream"]
    text_index_build(docs, idx, n_buckets=64)
    text_index_erase(
        spark, idx, docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    )
    before = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, n_buckets=64).collect()
    ]
    text_index_resize(spark, idx, n_buckets=128)
    # physical erasure: tombstones gone, postings hold survivors only
    assert not os.path.isdir(f"{idx}/tombstones")
    kept = spark.read.parquet(f"{idx}/postings")
    assert kept.filter(F.col("doc_id") % 7 == 0).count() == 0
    # the new hash space is in effect: bucket ids above the old
    # 64-bucket ceiling exist (deterministic for this corpus's vocab)
    new_ids = {
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{idx}/postings/bucket=*")
    }
    assert max(new_ids) >= 64, sorted(new_ids)
    after = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, n_buckets=128).collect()
    ]
    assert before == after  # rebucketing moves bytes, not semantics
    fused = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(
            docs.filter(F.col("doc_id") % 7 != 0), terms, k=10
        ).collect()
    ]
    assert after == fused
    # the old count is now rejected everywhere it could misroute
    with pytest.raises(ValueError, match="resized to n_buckets=128"):
        bm25_index_topk(spark, idx, terms, n_buckets=64)
    with pytest.raises(ValueError, match="resized to n_buckets=128"):
        text_index_append(docs.limit(5), idx, n_buckets=64)
    # appends at the new count keep working
    newdocs = docs.limit(5).withColumn(
        "doc_id", F.col("doc_id") + 100_000_000
    )
    text_index_append(newdocs, idx, n_buckets=128)
    assert bm25_index_topk(spark, idx, terms, n_buckets=128).count() > 0


def test_text_index_build_resets_resize_contract(spark, sf_dir, tmp_path):
    """A fresh build at a previously-resized path must reset the
    persisted bucket-count contract along with the tombstones: a
    stale meta/n_buckets from the old artifact would spuriously
    reject (or coincidentally bless) the rebuild's caller-managed
    count on every later append/serve."""
    import os

    from etl_gcp_spark.functions.text import (
        bm25_index_topk,
        text_index_build,
        text_index_resize,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "rebuild_after_resize")
    terms = ["spark", "vector", "stream"]
    text_index_build(docs, idx, n_buckets=64)
    text_index_resize(spark, idx, n_buckets=128)
    assert os.path.isdir(f"{idx}/meta")
    # rebuild at a THIRD count: must not trip the stale 128 guard
    text_index_build(docs, idx, n_buckets=32)
    assert not os.path.isdir(f"{idx}/meta")
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_index_topk(spark, idx, terms, n_buckets=32).collect()
    ]
    assert got  # serves under the rebuild's own contract


def test_streaming_decontamination_recovers_and_equals_batch(
    spark, sf_dir, tmp_path
):
    """Kill the benchmark-shard stream after trigger 2 of 4
    (post-write, pre-commit), resume from the checkpoint, and require
    the final serve to equal batch decontaminate_docs over the full
    benchmark — gram and verdict slices are batch_id-keyed overwrites
    of deterministic content, and per-batch re-excision of only the
    newly-affected docs must compose across shards (contamination is
    monotone)."""
    import os

    import pytest

    from etl_gcp_spark.operators.corpus import decontaminate_docs
    from etl_gcp_spark.streaming.text import (
        run_streaming_decontamination,
    )

    root = str(tmp_path / "decont_recovery")
    path = os.path.join(sf_dir, "documents.parquet")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_decontamination(
            spark, path, root=root, fail_after_batches=2
        )
    assert os.path.isdir(f"{root}/benchgrams")
    streamed = sorted(
        map(
            tuple,
            run_streaming_decontamination(spark, path, root=root).collect(),
        )
    )
    batch = sorted(
        map(
            tuple,
            decontaminate_docs(
                spark.read.parquet(path), benchmark_source="src0"
            ).collect(),
        )
    )
    assert streamed and streamed == batch
