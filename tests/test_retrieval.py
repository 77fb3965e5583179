"""Hybrid retrieval contracts: RRF fusion arithmetic and rank
boundaries, MMR greedy diversity selection (the redundant twin must be
deferred even when it is the second-most-relevant candidate)."""

from __future__ import annotations

from pyspark.sql import Row

from etl_gcp_spark.functions.retrieval import hybrid_rrf_topk, mmr_select

# vec 0 is the query; 1/2 are identical near-duplicates close to the
# query, 3 is moderately relevant and orthogonal to 1/2, 4 is noise.
MMR_VECS = {
    0: [1.0, 0.0, 0.0, 0.0],
    1: [0.9, 0.1, 0.0, 0.0],
    2: [0.9, 0.1, 0.0, 0.0],
    3: [0.6, 0.0, 0.8, 0.0],
    4: [0.0, 0.0, 0.0, 1.0],
}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=k, embedding=v) for k, v in vecs.items()]
    )


def _docs(spark):
    rows = [
        Row(doc_id=0, text="spark stream engine"),
        Row(doc_id=1, text="spark vector index"),
        Row(doc_id=2, text="cooking with butter"),
        Row(doc_id=3, text="vector stream spark vector"),
        Row(doc_id=4, text="gardening tips"),
    ]
    return spark.createDataFrame(rows)


def test_mmr_defers_redundant_twin(spark):
    out = mmr_select(_emb(spark, MMR_VECS), 0, depth=4, k=4, lam=0.5)
    rows = out.orderBy("pick").collect()
    picks = [r.vec_id for r in rows]
    # 1 wins on relevance (tie with identical 2 breaks to lower id).
    # Its exact duplicate 2 scores 0.5*rel - 0.5*1.0 < 0 at every
    # later step, so BOTH novel vectors (3, then orthogonal noise 4
    # at score exactly 0) are picked before the twin — the MMR
    # diversity property this operator exists for.
    assert picks == [1, 3, 4, 2]
    assert rows[0].redundancy == 0.0
    assert rows[1].redundancy == 0.59633  # sim(3,1)=0.5963302, 6 dp
    assert rows[2].redundancy == 0.0  # 4 orthogonal to 1 and 3
    assert rows[3].redundancy == 1.0  # identical to already-picked 1


def test_mmr_first_pick_is_pure_relevance(spark):
    out = mmr_select(_emb(spark, MMR_VECS), 0, depth=4, k=1, lam=0.5)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].pick == 1 and rows[0].vec_id == 1
    assert rows[0].redundancy == 0.0


def test_rrf_fuses_both_legs(spark):
    out = hybrid_rrf_topk(
        _docs(spark),
        _emb(spark, MMR_VECS),
        ["spark", "vector", "stream"],
        0,
        depth=5,
        k=5,
        rrf_k=60,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 3 tops the lexical leg (all three terms, "vector" twice);
    # docs 2 and 4 match no term -> lexical rank NULL.
    assert by_id[3].lex_rank == 1
    assert by_id[2].lex_rank is None and by_id[4].lex_rank is None
    # dense leg: query vec 0 excludes itself, rank 1 is vec 1 (tie
    # with identical vec 2 breaks to lower id).
    assert by_id[1].dense_rank == 1 and by_id[2].dense_rank == 2
    # fused score is exactly the two-term reciprocal sum, 6 dp.
    for r in out:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (60 + r.lex_rank)
        if r.dense_rank is not None:
            want += 1.0 / (60 + r.dense_rank)
        assert abs(r.rrf - round(want, 6)) < 1e-9
    # ordering: rrf desc, doc_id asc
    scores = [(r.rrf, -r.doc_id) for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_depth_bounds_each_leg(spark):
    out = hybrid_rrf_topk(
        _docs(spark),
        _emb(spark, MMR_VECS),
        ["spark"],
        0,
        depth=2,
        k=10,
    ).collect()
    for r in out:
        assert r.lex_rank is None or r.lex_rank <= 2
        assert r.dense_rank is None or r.dense_rank <= 2


def test_streaming_text_ingest_recovers_from_mid_stream_crash(
    spark, sf_dir, tmp_path
):
    """Kill the document ingest after trigger 2 of 4 (post-write,
    pre-commit), resume from the checkpoint, and require the served
    BM25 top-k to equal a full batch index build EXACTLY — append
    dirs are batch_id-keyed and overwrite-mode, so the replayed
    batch absorbs its own half-committed write. This is the text
    twin of the IVF recovery test."""
    import os

    import pytest

    from etl_gcp_spark.functions.text import bm25_index_topk, text_index_build
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.text import run_streaming_text_ingest

    root = str(tmp_path / "text_ingest_recovery")
    path = os.path.join(sf_dir, "documents.parquet")
    terms = ["spark", "vector", "stream"]
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_text_ingest(
            spark, path, terms, root=root, fail_after_batches=2, k=10
        )
    streamed = {
        r.doc_id: r.bm25
        for r in run_streaming_text_ingest(
            spark, path, terms, root=root, k=10
        ).collect()
    }
    bidx = str(tmp_path / "text_batch_twin")
    text_index_build(load_table(spark, sf_dir, "documents"), bidx)
    batch = {
        r.doc_id: r.bm25
        for r in bm25_index_topk(spark, bidx, terms, k=10).collect()
    }
    assert streamed == batch and len(streamed) == 10
