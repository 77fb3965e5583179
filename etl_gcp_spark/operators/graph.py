"""Connected components over a pair graph — dedup clustering.

The reference's dedup is keep-first over exact row groups
(data_loader.py:301-311); the near-dup family (text_dedup.py) emits
similar PAIRS. At corpus scale the pairs must be closed into
CLUSTERS — a chain a~b~c is one duplicate group even when (a,c)
itself is below threshold — and each cluster collapsed to one
canonical representative. That closure is connected components.

Spark-first design: iterative min-label propagation over the edge
list. Each round is one shuffle-join (labels ⋈ edges) plus one
map-side-combinable ``groupBy(min)``; labels only ever decrease, so
the fixpoint test is a 1-row aggregate comparing ``sum(label)``
between rounds (no row-wise diff join). Lineage is cut every round
with ``localCheckpoint`` — without it the plan doubles per iteration
and the job dies at ~20 rounds.

Round count is bounded by component diameter. Near-dup clusters are
near-cliques (every member within threshold of a shared template),
so 2-3 rounds close them; for adversarial long-chain graphs switch
to alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) which contracts in
O(log² n) rounds — same per-round shuffle shape, so the plumbing
here carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, component) for every vertex; component = min reachable id.

    ``vertices`` supplies the universe (isolated vertices come out as
    their own singleton component); ``edges`` is undirected input —
    each row connects ``src_col`` ↔ ``dst_col`` regardless of order.
    """
    # bootstrap checkpoints stay EAGER: lazy ones materialize inside
    # round 1's job, where sym and labels are sibling branches of one
    # plan — their shared upstream (the pair-generation chain) gets
    # recomputed per branch in racing stages instead of once per
    # materialization job (r10: tried lazy, entity_erasure_audit build
    # regressed 13.5 → 41 s isolated; reverted)
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=True)
    # sum(lbl) is a monotone potential: propagation only lowers labels,
    # so equality between rounds IS convergence. DECIMAL(38,0) keeps the
    # sum exact for any realistic id domain (no double truncation).
    # The initial potential is NOT measured with its own aggregate job:
    # round 1 can only leave the sum unchanged when no label moves at
    # all, and the None sentinel forces at least one round either way —
    # an edge-free input just pays one extra (trivial) round instead of
    # every input paying one extra job (r10).
    total = None
    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym["u"] == labels["node"])
            .select(F.col("v").alias("node"), F.col("lbl"))
        )
        # lazy checkpoint: the convergence aggregate below is the
        # action that materializes it, so each round runs ONE job
        # (join+groupBy+checkpoint+agg) instead of two (the eager
        # form's separate materialization job)
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        new_total = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).first()[0]
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iterations} rounds"
        )
    return labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("component")
    )


def dedup_clusters(
    documents: DataFrame,
    *,
    threshold: float = 0.8,
    n: int = 3,
    pair_source: str = "lsh",
    cc_engine: str = "propagation",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate clustering: close the similar-pair graph into
    components and label every document with its canonical (minimum)
    cluster id.

    ``pair_source`` picks the edge generator: ``"lsh"`` (default) is
    MinHash-LSH banding — linear in corpus + candidates, the 100 TB
    path; ``"exact"`` is the AllPairs exact-Jaccard inverted index,
    the oracle baseline. Cluster output is identical wherever LSH
    recall is 1 (verified pairwise-identical at sf0.001/sf0.01, so
    the recursive-CTE DuckDB oracle applies to both at those scales).

    ``cc_engine`` picks the closure algorithm: ``"propagation"``
    (default, O(diameter) rounds — near-clique dedup graphs close in
    2-3) or ``"star"`` (alternating large-star/small-star, O(log² n)
    rounds — the long-chain-safe path). Both produce the identical
    (min-reachable-id) labeling, so the same oracle attaches.

    Output: (doc_id, cluster_id, cluster_size). Singleton documents —
    no similar partner, or too short to shingle — keep themselves as
    cluster_id with cluster_size 1. Downstream keep-one-per-cluster
    dedup is ``filter(doc_id == cluster_id)``; unlike the greedy rule
    in :func:`~etl_gcp_spark.operators.text_dedup.near_dup_dedup`
    (drop any doc matching a lower id), clustering keeps exactly one
    representative per transitive group.
    """
    from etl_gcp_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    pair_fn = {"lsh": minhash_lsh_pairs, "exact": ngram_jaccard_pairs}[
        pair_source
    ]
    pairs = pair_fn(
        documents, threshold=threshold, n=n, text_col=text_col, id_col=id_col
    ).persist()
    # iterate ONLY over vertices that appear in some edge — in a real
    # corpus the overwhelming majority of documents have no near-dup,
    # and dragging them through every propagation round multiplies
    # each iteration's shuffle by corpus size for no information.
    # Isolated docs re-enter at the end as singleton clusters via one
    # anti-join (measured at sf0.1: 3.0 s → 2.1 s).
    edge_verts = (
        pairs.select(F.col("id1").alias(id_col))
        .union(pairs.select(F.col("id2").alias(id_col)))
        .dropDuplicates()
    )
    cc_fn = {
        "propagation": connected_components,
        "star": connected_components_star,
    }[cc_engine]
    comp = cc_fn(
        edge_verts,
        pairs,
        id_col=id_col,
        src_col="id1",
        dst_col="id2",
    ).select(F.col(id_col), F.col("component").alias("cluster_id"))
    sizes = F.count("*").over(Window.partitionBy("cluster_id"))
    clustered = comp.select(
        id_col, "cluster_id", sizes.cast("bigint").alias("cluster_size")
    )
    singles = documents.join(edge_verts, id_col, "left_anti").select(
        F.col(id_col),
        F.col(id_col).alias("cluster_id"),
        F.lit(1).cast("bigint").alias("cluster_size"),
    )
    from etl_gcp_spark.caching import tag_pinned

    # long-lived sessions: release the edge pin with
    # etl_gcp_spark.caching.unpersist_pinned(result) after materializing
    return tag_pinned(clustered.unionByName(singles), pairs)


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — O(log² n) rounds regardless of component
    DIAMETER, where min-label propagation needs O(diameter) rounds.

    Use this for adversarial graphs (long chains — e.g. near-dup
    "telephone game" drift across a crawl); for near-clique dedup
    graphs :func:`connected_components` converges in 2-3 cheaper
    rounds. Same output contract: (id, component = min reachable id).

    Per round each operator is one groupBy(min) plus one join — the
    same shuffle shape as a propagation round; the win is round COUNT.
    Convergence = the edge multiset is a fixpoint of both operators,
    detected with an order-insensitive (count, hash-sum) signature —
    collision odds ~2⁻⁶⁴ per round, acceptable for a loop guard that
    is additionally capped at ``max_iterations``.
    """

    def _sig(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # direct every edge from the larger endpoint: u ≥ v
        directed = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = directed.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            directed.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
        )

    cur = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    sig = _sig(cur)
    for _ in range(max_iterations):
        cur = small_star(large_star(cur)).localCheckpoint(eager=True)
        new_sig = _sig(cur)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint in {max_iterations} rounds"
        )
    # at the fixpoint the edge set is a star forest: u → component min
    membership = cur.select(
        F.col("u").alias(id_col), F.col("v").alias("component")
    )
    singletons = vertices.select(F.col(id_col)).join(
        membership.select(id_col), id_col, "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("component"))
    return membership.unionByName(singletons)


def embedding_dedup_clusters(
    embeddings: DataFrame,
    *,
    threshold: float = 0.45,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedup clusters over an EMBEDDING column (SemDeDup
    lineage — Abbas et al. 2023, public methodology: near-duplicate
    semantics live in embedding space, not token space): close the
    cosine-similar pair graph into components and label every vector
    with its canonical (minimum) cluster id.

    Pair generation is the distributed blocked GEMM
    (:func:`~etl_gcp_spark.functions.similarity
    .blocked_exact_near_dup_pairs`) — exact at any corpus size, no
    driver collect — so unlike the LSH route there is no recall
    caveat; swap in the SRP-LSH generator at high thresholds where
    banding prunes. Same output contract as :func:`dedup_clusters`:
    (id, cluster_id, cluster_size), singletons keep themselves;
    keep-one-per-cluster dedup is ``filter(id == cluster_id)``.
    """
    from etl_gcp_spark.functions.similarity import (
        blocked_exact_near_dup_pairs,
    )

    pairs = blocked_exact_near_dup_pairs(
        embeddings,
        threshold=threshold,
        n_blocks=n_blocks,
        id_col=id_col,
        vec_col=vec_col,
    ).persist()
    edge_verts = (
        pairs.select(F.col("id1").alias(id_col))
        .union(pairs.select(F.col("id2").alias(id_col)))
        .dropDuplicates()
    )
    comp = connected_components(
        edge_verts, pairs, id_col=id_col, src_col="id1", dst_col="id2"
    ).select(F.col(id_col), F.col("component").alias("cluster_id"))
    sizes = F.count("*").over(Window.partitionBy("cluster_id"))
    clustered = comp.select(
        id_col, "cluster_id", sizes.cast("bigint").alias("cluster_size")
    )
    singles = embeddings.join(edge_verts, id_col, "left_anti").select(
        F.col(id_col),
        F.col(id_col).alias("cluster_id"),
        F.lit(1).cast("bigint").alias("cluster_size"),
    )
    from etl_gcp_spark.caching import tag_pinned

    # long-lived sessions: release the edge pin with
    # etl_gcp_spark.caching.unpersist_pinned(result) after materializing
    return tag_pinned(clustered.unionByName(singles), pairs)


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (Page et al.
    1999, public methodology) — fixed rounds + per-round 8-dp
    rounding make every intermediate replayable, so a SQL oracle can
    chain the same power iterations and hash-match the result.

    Per round: one join of the rank frame onto the edge list keyed by
    source, one map-side-combined sum per destination, one left join
    back onto the node universe for the teleport base — the rank and
    node frames are proportional to |V| (tiny next to the data that
    BUILT the edges), so at scale both sides of every join broadcast.
    Dangling mass is NOT redistributed (documented convention; ranks
    then sum to < 1 when sinks exist).  Output: (node, pagerank)
    rounded to 6 dp.
    """
    n = nodes.agg(F.count(F.lit(1)).alias("__n"))
    out_w = edges.groupBy(src_col).agg(F.sum(weight_col).alias("__ow"))
    frac = edges.join(out_w, src_col).select(
        F.col(src_col),
        F.col(dst_col),
        (F.col(weight_col).cast("double") / F.col("__ow")).alias("__f"),
    )
    ranks = nodes.join(F.broadcast(n)).select(
        F.col(node_col),
        F.round(F.lit(1.0) / F.col("__n"), 8).alias("__r"),
    )
    for _ in range(iterations):
        contrib = (
            frac.join(
                F.broadcast(ranks), frac[src_col] == ranks[node_col]
            )
            .groupBy(dst_col)
            .agg(F.sum(F.col("__f") * F.col("__r")).alias("__c"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contrib),
                nodes[node_col] == contrib[dst_col],
                "left",
            )
            .join(F.broadcast(n))
            .select(
                F.col(node_col),
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce("__c", F.lit(0.0)),
                    8,
                ).alias("__r"),
            )
        )
    return ranks.select(
        F.col(node_col), F.round("__r", 6).alias("pagerank")
    )


def event_transition_pagerank(
    events: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the event-type TRANSITION graph: edge (a → b)
    weighted by how often an event of type ``b`` directly follows one
    of type ``a`` within the same user's stream (ordered by ts, then
    event_id for determinism).  The heavy lifting is the edge build —
    one window pass over the full event log (partitioned by user, so
    it parallelizes and never materializes a global sort) plus one
    combined aggregation; the rank iterations then run on the tiny
    type graph.  Centrality over billions of raw events for the cost
    of one shuffle: the 100 TB shape.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = events.select(
        F.col("event_type").alias("node")
    ).dropDuplicates()
    return pagerank(
        edges, nodes, iterations=iterations, damping=damping
    )


def triangle_participation(
    edges: DataFrame,
    *,
    src_col: str = "id1",
    dst_col: str = "id2",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list — the
    transitivity audit for near-dup graphs: a dedup cluster whose
    members are pairwise-similar is triangle-dense, while a
    low-triangle component is a CHAIN (a~b~c with a,c dissimilar) —
    exactly where single-threshold pair dedup over- or under-merges
    and where LSH recall gaps hide. Classic MapReduce formulation
    (Suri & Vassilvitskii, WWW'11): orient every edge low→high id, so
    each triangle {a<b<c} is counted exactly once as the path
    (a→b, b→c) closed by (a→c).

    Two self-joins of the oriented edge list — the first keyed on the
    shared middle vertex, the second verifying the closing edge; both
    equi-joins, map-side combinable counting after. Near-dup graphs
    bound triangle fan-out by cluster size; for general graphs the
    standard high-degree mitigation (degree-ordered orientation) is
    the same join shape keyed on (degree, id) order.

    Output: (doc_id, n_triangles) for every vertex in ≥1 triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .dropDuplicates()
    )
    path = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(
            e.select(F.col("u").alias("b"), F.col("v").alias("c")), "b"
        )
    )
    tri = path.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
    )
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("doc_id")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def kcore_embedding_graph(
    embeddings: DataFrame,
    *,
    k: int = 5,
    core_k: int = 3,
    rounds: int = 16,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``core_k``-core of the MUTUAL-kNN embedding graph — the dense
    semantic neighborhoods of a corpus: templated/boilerplate regions
    and oversampled modes survive the peel, one-off documents do not.
    Mutual-kNN (edge iff each endpoint is in the other's top-``k``)
    is the standard densification filter before the core
    decomposition; plain kNN gives every node out-degree k and makes
    the k-core vacuous.

    Peeling (Matula & Beck's iterative-removal k-core): repeatedly
    drop nodes with degree < ``core_k`` until a fixpoint. Each round
    aggregates per-node degree from the CURRENT edge list (map-side
    combined — the exchange carries node partials, not edges) and
    semi-joins the surviving-node set back against both endpoints;
    edges shrink monotonically and lineage is cut per round with
    ``localCheckpoint`` like :func:`connected_components`. ``rounds``
    is a FIXED upper bound that is part of the operator contract:
    both this implementation and the SQL oracle execute exactly
    min(rounds, convergence) effective peels — after the fixpoint
    further rounds are no-ops on both sides, so results agree at any
    ``rounds``; pick it ≥ the observed peel depth (8 on the synthetic
    corpus) for the true core.

    Scale shape: the mutual-kNN edge list is ≤ n·k rows (built from
    the distributed blocked-GEMM :func:`~etl_gcp_spark.functions.
    similarity.knn_graph` — no all-pairs materialization), and every
    peel round is linear in surviving edges. The early exit fires on
    an unchanged edge count — valid because peeling is monotone.

    Output: (id, core_degree) for nodes in the core — degree counted
    within the final core subgraph.
    """
    from etl_gcp_spark.functions.similarity import knn_graph

    knn = knn_graph(
        embeddings, k=k, n_blocks=n_blocks, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("a"), F.col("nbr_id").alias("b"))
    mutual = (
        knn.alias("x")
        .join(
            knn.alias("y"),
            (F.col("x.a") == F.col("y.b")) & (F.col("x.b") == F.col("y.a")),
        )
        .select(F.col("x.a").alias("u"), F.col("x.b").alias("v"))
        .filter(F.col("u") < F.col("v"))
    )
    edges = (
        mutual.select("u", "v")
        .union(mutual.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    for _ in range(rounds):
        # degree via map-side-combined aggregation + two semi-joins on
        # the surviving-node set, NOT two windows over the edge list:
        # the windows shuffled and sorted the FULL edge list twice per
        # round, while the degree table is one node-sized partial-agg
        # exchange and the semi-joins broadcast it whenever it fits
        # (AQE decides from runtime size; at cluster scale they
        # degrade to the same two edge exchanges the windows always
        # paid, minus the sorts). The edge list is symmetric, so
        # groupBy("u") counts every node's full incident degree.
        alive = (
            edges.groupBy("u")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") >= core_k)
            .select("u")
        )
        edges = (
            edges.join(alive, "u", "semi")
            .join(alive.select(F.col("u").alias("v")), "v", "semi")
            .localCheckpoint(eager=False)
        )
        n_next = edges.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    return edges.groupBy("u").agg(
        F.count(F.lit(1)).alias("core_degree")
    ).select(F.col("u").alias(id_col), "core_degree")


def ensemble_near_dup_clusters(
    documents: DataFrame,
    embeddings: DataFrame,
    *,
    jaccard_threshold: float = 0.8,
    cosine_threshold: float = 0.45,
    n: int = 3,
    n_blocks: int = 8,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Multi-signal duplicate clustering: union the LEXICAL edge set
    (exact n-gram Jaccard pairs) with the SEMANTIC edge set
    (embedding-cosine pairs), close the combined graph into connected
    components, and label every document. Lexical-only dedup misses
    paraphrases; embedding-only dedup misses verbatim copies whose
    embeddings drifted (truncation, encoder version skew) — a
    production curation pass runs both and dedups on the union,
    which is exactly this closure (a doc chained to a lexical twin
    AND a semantic twin pulls all three into one cluster).

    Both edge generators here are the exact, oracle-replayable
    variants (AllPairs inverted index; distributed blocked GEMM — no
    broadcast-fit requirement); at 100 TB swap in their banded
    siblings (``minhash_lsh_pairs``, SRP-LSH) — the union/closure
    plumbing is generator-agnostic. Assumes the corpus keys docs and
    vectors in ONE id space (doc_id ≡ vec_id), the convention of the
    synthetic tables; pass a mapping join upstream otherwise.

    Output: (doc_id, cluster_id, cluster_size) over ALL documents —
    singletons keep themselves; keep-one-per-cluster dedup is
    ``filter(doc_id == cluster_id)``.
    """
    from etl_gcp_spark.functions.similarity import (
        blocked_exact_near_dup_pairs,
    )
    from etl_gcp_spark.operators.text_dedup import ngram_jaccard_pairs

    lex = ngram_jaccard_pairs(
        documents, threshold=jaccard_threshold, n=n, id_col=doc_id_col
    ).select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    sem = blocked_exact_near_dup_pairs(
        embeddings,
        threshold=cosine_threshold,
        n_blocks=n_blocks,
        id_col=vec_id_col,
    ).select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    edges = lex.union(sem).dropDuplicates()
    comp = connected_components(
        documents.select(F.col(doc_id_col).alias("id")),
        edges,
        id_col="id",
    )
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias(doc_id_col),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
