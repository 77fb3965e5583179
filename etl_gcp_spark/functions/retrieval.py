"""Hybrid retrieval operators: rank fusion and diversity re-ranking.

The reference engine ships lexical scans and exact lookups only; a
training-data / RAG pipeline additionally needs the standard two-stage
retrieval stack — a lexical ranker (BM25, `functions/text.py`) and a
dense ranker (cosine / ANN ladder, `functions/similarity.py`) fused
into one ranking, then a diversity re-rank over the fused candidates.
Both stages here are compositions of already-proven operators, so the
DuckDB oracles compose the two proven SQL replays.

Scale shape: every leg is a top-``depth`` ranking produced by the
underlying distributed operator (TakeOrderedAndProject / windowed
rank); the fusion itself touches only ≤ depth rows per leg, so fusing
is O(depth) regardless of corpus size — at 100 TB the cost lives in
the legs (which bucket/broadcast per their own docstrings), never in
the fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from etl_gcp_spark.smalldf import small_df


def hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    *,
    depth: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    dim: int | None = None,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal-rank fusion of a BM25 lexical ranking and a dense
    cosine ranking (Cormack, Clarke & Buettcher, SIGIR'09) — the
    standard hybrid-retrieval fuser, score-scale-free by construction.

    Each leg retrieves its top-``depth`` candidates with the proven
    operator (:func:`~etl_gcp_spark.functions.text.bm25_topk`,
    :func:`~etl_gcp_spark.functions.similarity.cosine_topk`), ranks
    are assigned by (score DESC, id) — the same deterministic
    tie-break both underlying oracles replay — and the fused score is

        rrf = 1/(rrf_k + lex_rank) + 1/(rrf_k + dense_rank)

    with an absent leg contributing 0. Both terms are IEEE divisions
    of exact integers and the two-term sum has a fixed order, so the
    fused score is bit-identical across engines (rounded to 6 dp for
    display only). The dense leg's query is the vector with id
    ``query_vec_id`` and excludes itself; the lexical leg is a bag of
    terms, so the query document MAY legitimately appear in the
    lexical ranking — documented asymmetry, standard for hybrid
    search over a corpus keyed by one id space.

    Output: (doc_id, lex_rank, dense_rank, rrf) — top-``k`` by
    (rrf DESC, doc_id); rank columns are NULL for the leg that did
    not retrieve the doc.
    """
    from etl_gcp_spark.functions.similarity import cosine_topk
    from etl_gcp_spark.functions.text import bm25_topk

    lex = bm25_topk(
        documents,
        query_terms,
        k=depth,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=doc_id_col,
    )
    # bounded: ≤ depth rows — the frame is the already-limited
    # top-``depth`` leg by construction, never data-sized, so
    # Spark's "No Partition Defined" warning does not indicate a
    # scale risk here
    lex_ranked = lex.select(
        F.col(doc_id_col).alias("__id"),
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col(doc_id_col)))
        .alias("lex_rank"),
    )
    dense_ranked = cosine_topk(
        embeddings,
        query_ids=[query_vec_id],
        k=depth,
        dim=dim,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select(F.col("neighbor_id").alias("__id"), F.col("rank").alias("dense_rank"))

    fused = lex_ranked.join(dense_ranked, "__id", "full_outer").select(
        F.col("__id").alias(doc_id_col),
        "lex_rank",
        "dense_rank",
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(doc_id_col)).limit(k)


def mmr_select(
    embeddings: DataFrame,
    query_vec_id: int,
    *,
    depth: int = 20,
    k: int = 5,
    lam: float = 0.5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick ``k`` of the query's top-``depth`` cosine
    candidates, each step maximizing

        mmr = lam * rel(c) − (1 − lam) * max_{s ∈ selected} sim(c, s)

    — relevance traded against redundancy, the standard
    post-retrieval diversity step (dedups near-identical passages
    before they reach a context window).

    Scale shape: candidate generation is the distributed
    :func:`cosine_topk` leg and the depth² pairwise sims come from a
    broadcast self-join of the candidate set — all corpus-size work
    is distributed. The greedy chain itself is inherently sequential
    (each pick depends on all previous picks), so it runs driver-side
    over the COLLECTED candidate/pair frames — a documented
    size-scoped collect (≤ depth and depth² rows by construction,
    depth defaulting to 20; the same contract as the codebase's
    broadcast-side builds), O(k·depth) work independent of corpus
    size.

    Determinism: relevance is the 6-dp-rounded cosine the proven
    oracle replays; pairwise sims round to 6 dp; the step score
    ``lam*rel − (1−lam)*maxsim`` is a fixed two-term IEEE expression
    on those rounded inputs, and argmax ties break on candidate id —
    so selection replays exactly in the DuckDB recursive-CTE oracle.

    Output: (pick, vec_id, rel, redundancy) — selection order
    1..k, the candidate's relevance to the query, and the max
    similarity to previously-selected items (0.0 for the first pick).
    """
    from etl_gcp_spark.functions.similarity import cosine_similarity

    spark = embeddings.sparkSession
    cands = (
        cosine_topk_frame(
            embeddings,
            query_vec_id,
            depth=depth,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
        .select(F.col("neighbor_id").alias("cid"), F.col("sim").alias("rel"))
    )
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    a = vecs.selectExpr(f"{id_col} AS ca", "__v AS va")
    bb = vecs.selectExpr(f"{id_col} AS cb", "__v AS vb")
    pair_sims = (
        cands.selectExpr("cid AS ca")
        .join(a, "ca")
        .crossJoin(F.broadcast(cands.selectExpr("cid AS cb").join(bb, "cb")))
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "ca",
            "cb",
            F.round(cosine_similarity(F.col("va"), F.col("vb"), dim), 6).alias(
                "psim"
            ),
        )
    )

    # Greedy chain on the depth-bounded frames: materialize candidates
    # and the depth² pair sims (tiny by construction), then k argmax
    # steps. collect() here is NOT a driver-side scan of data — both
    # frames are outputs of distributed top-depth retrieval, ≤ depth
    # and depth² rows by contract.
    cand_rows = {r["cid"]: r["rel"] for r in cands.collect()}
    sim_rows = {(r["ca"], r["cb"]): r["psim"] for r in pair_sims.collect()}
    selected: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    for step in range(1, min(k, len(cand_rows)) + 1):
        best = None
        for cid in sorted(cand_rows):
            if cid in chosen:
                continue
            red = max(
                (sim_rows.get((cid, s), 0.0) for s in chosen), default=0.0
            )
            score = lam * cand_rows[cid] - (1.0 - lam) * red
            if best is None or score > best[0]:
                best = (score, cid, cand_rows[cid], red)
        chosen.append(best[1])
        selected.append((step, best[1], best[2], best[3]))
    return small_df(
        spark, selected, "pick int, vec_id bigint, rel double, redundancy double"
    )


def cosine_topk_frame(
    embeddings: DataFrame,
    query_vec_id: int,
    *,
    depth: int,
    dim: int | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Single-query top-``depth`` cosine candidates (thin wrapper over
    :func:`~etl_gcp_spark.functions.similarity.cosine_topk` for one
    query id)."""
    from etl_gcp_spark.functions.similarity import cosine_topk

    return cosine_topk(
        embeddings,
        query_ids=[query_vec_id],
        k=depth,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
