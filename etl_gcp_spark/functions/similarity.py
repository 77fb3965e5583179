"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB training-data pipeline needs:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set, score every (query, candidate) pair with a JVM-side
  ``zip_with``/``aggregate`` dot product, take per-query top-k. Exact
  baseline; cost O(|Q|·|C|·dim) but embarrassingly parallel and
  shuffle-free until the final per-query heap.
- :func:`lsh_bucketed_topk` — sign-random-projection LSH: candidates
  restricted to matching hash buckets (multi-table), then exact
  re-scoring of candidates only. The scale path: candidate count per
  query is bounded by bucket occupancy instead of |C|. Hyperplanes
  are pseudo-random from ``xxhash64`` so the operator is fully
  deterministic with no stored model state.

Everything is built-in Column expressions — no UDF, no Python
serde — embedding math runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column, dim: int | None = None) -> F.Column:
    """Dot product of two array<double> columns.

    With ``dim`` known, the sum is unrolled into a flat expression
    tree (``a[0]*b[0] + … + a[d-1]*b[d-1]``) that whole-stage codegen
    compiles — measured ~20× faster than the higher-order-function
    form, whose lambda evaluates interpreted per element. The HOF
    form remains the dimension-agnostic fallback.
    """
    if dim is not None:
        s = a.getItem(0) * b.getItem(0)
        for i in range(1, dim):
            s = s + a.getItem(i) * b.getItem(i)
        return s
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column, dim: int | None = None) -> F.Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_similarity(
    a: F.Column, b: F.Column, dim: int | None = None
) -> F.Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def cosine_topk(
    embeddings: DataFrame,
    *,
    query_ids: list[int] | None = None,
    query_filter=None,
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side (small) is broadcast against the full candidate
    set; ranking ties break on neighbor id so the result set is
    deterministic. Output: (query_id, neighbor_id, sim, rank).
    Pass ``dim`` to unroll the cosine into codegen (see :func:`_dot`).
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    if query_filter is None:
        query_filter = F.col(id_col).isin(query_ids or [])
    q = base.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    c = base.select(F.col(id_col).alias("neighbor_id"), F.col("__v").alias("__c"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__q"), F.col("__c"), dim).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), 6).alias("sim"),
            F.col("rank"),
        )
    )


def _srp_bucket(vec: F.Column, table: int, n_planes: int, dim: int) -> F.Column:
    """Sign-random-projection bucket id for one LSH table.

    Hyperplane component (table t, plane p, dim d) is a deterministic
    pseudo-random ±1 from ``xxhash64(t,p,d)`` — no stored model, any
    executor recomputes it identically.
    """
    def proj_at(p: int):
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(table), F.lit(p), d), F.lit(2)) == 0,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bit = F.when(proj_at(p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    *,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP-LSH bucket join + exact re-scoring.

    Candidates = vectors sharing ≥1 of ``n_tables`` bucket ids with
    the query. The bucket join shuffles only (table, bucket, id);
    exact cosine runs on candidates alone. Recall rises with
    ``n_tables``, bucket size falls with ``n_planes`` — defaults are
    tuned for ~unit-norm 64-d clustered embeddings.
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    buckets = base.select(
        F.col(id_col),
        F.col("__v"),
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _srp_bucket(F.col("__v"), t, n_planes, dim).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "__v", "tb.tbl", "tb.bkt")
    q = buckets.filter(F.col(id_col).isin(query_ids or [])).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__q"),
        "tbl",
        "bkt",
    )
    c = buckets.select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("__c"), "tbl", "bkt"
    )
    cands = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__q", "__c")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__q"), F.col("__c")).alias("__sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), 6).alias("sim"),
            "rank",
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ threshold).

    Same LSH bucketing as :func:`lsh_bucketed_topk` but symmetric:
    pairs sharing a bucket, verified exactly. The all-pairs analog of
    document near-dup dedup, for modality-agnostic dedup by embedding.
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    buckets = base.select(
        F.col(id_col),
        F.col("__v"),
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _srp_bucket(F.col("__v"), t, n_planes, dim).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "__v", "tb.tbl", "tb.bkt")
    a = buckets.select(
        "tbl", "bkt", F.col(id_col).alias("id1"), F.col("__v").alias("v1")
    )
    b = buckets.select(
        "tbl", "bkt", F.col(id_col).alias("id2"), F.col("__v").alias("v2")
    )
    return (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
        .select(
            "id1",
            "id2",
            F.round(cosine_similarity(F.col("v1"), F.col("v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def exact_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (brute force).

    Broadcast-GEMM design: the candidate matrix is collected once at
    build time (n×d float64 — 1 MB per 2K vectors at d=64), unit-
    normalized, and broadcast; the distributed side streams through
    an Arrow-batched ``mapInPandas`` kernel that computes a numpy
    GEMM per batch (block × matrixᵀ) and emits only pairs above the
    threshold with ``id1 < id2``. BLAS turns the O(n²·d) math into
    ~hundreds of Mflops of dense matmul: measured 66 s (expression
    cross-join) → 0.3 s at sf0.1 for identical output.

    Scope: exact baseline, valid while ONE side fits in a broadcast
    (~GBs of vectors). Past that, use the LSH variant
    (:func:`embedding_near_dup_pairs`) whose cost is linear in the
    corpus plus candidate pairs.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    rows = embeddings.select(id_col, vec_col).collect()
    cand_ids = np.array([r[0] for r in rows], dtype=np.int64)
    cm = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cand_ids, cm))

    def kernel(batches):
        ids_c, mat_c = bc.value
        for pdf in batches:
            block = np.stack(
                pdf[vec_col]
                .map(lambda v: np.asarray(v, dtype=np.float64))
                .values
            )
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ mat_c.T
            ids_b = pdf[id_col].to_numpy()
            ii, jj = np.where(sims >= threshold)
            keep = ids_b[ii] < ids_c[jj]
            yield pd.DataFrame(
                {
                    "id1": ids_b[ii][keep],
                    "id2": ids_c[jj][keep],
                    "sim": np.round(sims[ii, jj][keep], 6),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "id1 long, id2 long, sim double"
    )


def _pivot_cells(pivot_vecs: list[list[float]]) -> F.Column:
    """Array of (cosine-to-pivot, cell) structs for the ``__v`` column,
    with pivots inlined as literals — evaluated per row with NO
    shuffle and no join. Cell ids are negated inside the struct so
    ``array_max``'s lexicographic tiebreak prefers the LOWEST cell."""
    return F.array(
        *[
            F.struct(
                # HOF cosine, not the dim-unrolled form: an 8×64
                # unrolled literal tree exceeds codegen method limits
                # and falls back to slower interpreted eval (measured
                # 3.8s → 35s at sf0.1)
                cosine_similarity(
                    F.col("__v"), F.array(*[F.lit(x) for x in vec])
                ).alias("s"),
                F.lit(-(i + 1)).alias("negcell"),
            )
            for i, vec in enumerate(pivot_vecs)
        ]
    )


def ivf_assign(
    embeddings: DataFrame,
    *,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantization: assign every vector to its nearest
    pivot cell. Returns (assigned, pivot_vectors).

    Pivots are the ``n_cells`` lowest-id vectors — deterministic and
    model-free (production systems train k-means centroids offline;
    the search structure is identical, only pivot quality differs).
    The tiny pivot set is collected once at index-build time and
    inlined as literals, so assignment is a pure per-row argmax —
    embarrassingly parallel, zero shuffle, zero join.
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    pivot_vecs = [
        list(r["__v"]) for r in base.orderBy(id_col).limit(n_cells).collect()
    ]
    assigned = base.withColumn(
        "cell", -F.array_max(_pivot_cells(pivot_vecs))["negcell"]
    )
    return assigned, pivot_vecs


def ivf_topk(
    embeddings: DataFrame,
    *,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize, probe the query's
    ``n_probe`` nearest cells, exact-rescore candidates only.

    The classic ANN index re-expressed relationally: the inverted
    file IS a DataFrame keyed by cell; probing IS a join on cell ids
    (broadcast: the query side is small). Scan cost drops from |C| to
    ~|C|·n_probe/n_cells per query; recall rises with ``n_probe``
    (n_probe = n_cells degenerates to exact brute force).
    """
    assigned, pivot_vecs = ivf_assign(
        embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    # per query: its n_probe closest cells = slice of the sorted
    # (sim, -cell) struct array — same inline pivots, still no shuffle
    probed = (
        assigned.filter(F.col(id_col).isin(query_ids or []))
        .withColumn(
            "__probe_cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.sort_array(_pivot_cells(pivot_vecs), asc=False),
                        1,
                        n_probe,
                    ),
                    lambda s: -s["negcell"],
                )
            ),
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col("__v").alias("__q"),
            F.col("__probe_cell").alias("cell"),
        )
    )
    cands = probed.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col("__v").alias("__c"), "cell"
        ),
        "cell",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    rescore_dim = len(pivot_vecs[0]) if pivot_vecs else None
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            cosine_similarity(
                F.col("__q"), F.col("__c"), rescore_dim
            ).alias("__sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), 6).alias("sim"),
            "rank",
        )
    )
