"""Connected-components / dedup-clustering contracts.

A hand-built graph with a chain (transitive closure must merge it),
a separate 2-clique, and isolated vertices; then the composed
dedup_clusters operator on the crafted corpus from test_text_dedup.
"""

from __future__ import annotations

from pyspark.sql import Row

from etl_gcp_spark.operators.graph import connected_components, dedup_clusters


def _graph(spark):
    vertices = spark.createDataFrame([Row(id=i) for i in range(1, 9)])
    # chain 1-2-3-4 (plus a reversed edge), clique 5-6, isolated 7, 8
    edges = spark.createDataFrame(
        [
            Row(src=2, dst=1),
            Row(src=2, dst=3),
            Row(src=3, dst=4),
            Row(src=5, dst=6),
        ]
    )
    return vertices, edges


def test_chain_closes_transitively(spark):
    vertices, edges = _graph(spark)
    got = {
        r["id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8}


def test_self_loops_and_dup_edges_are_harmless(spark):
    vertices = spark.createDataFrame([Row(id=i) for i in (10, 20)])
    edges = spark.createDataFrame(
        [Row(src=10, dst=10), Row(src=10, dst=20), Row(src=20, dst=10)]
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {10: 10, 20: 10}


def test_dedup_clusters_groups_chain_not_just_pairs(spark):
    # a~b and b~c similar, a~c NOT directly similar: clustering must
    # still place all three in one cluster (vs near_dup_dedup's greedy
    # pairwise rule). Build texts so adjacent jaccard >= 0.8.
    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:36] + ["x1", "x2", "x3", "x4"])   # ~0.8 vs a
    c = " ".join(base[:32] + ["x1", "x2", "x3", "x4", "y1", "y2", "y3", "y4"])
    other = "entirely unrelated words making one more document here now"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=a),
            Row(doc_id=2, text=b),
            Row(doc_id=3, text=c),
            Row(doc_id=4, text=other),
            Row(doc_id=5, text="too short"),
        ]
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        # exact pair source: this test checks transitive-closure
        # semantics, not LSH recall (a J≈0.7 edge on a 5-doc fixture
        # is below the default banding's reliable-recall regime)
        for r in dedup_clusters(
            docs, threshold=0.7, pair_source="exact"
        ).collect()
    }
    assert rows[4] == (4, 1) and rows[5] == (5, 1)
    # all of 1,2,3 share cluster 1 iff the closure merged the chain
    assert rows[1] == (1, 3) and rows[2] == (1, 3) and rows[3] == (1, 3)
    # every doc labeled exactly once
    assert len(rows) == 5


def test_dedup_clusters_lsh_matches_exact_source(spark, sf_dir):
    # the registered (default) LSH pair source must produce the same
    # clustering as the exact AllPairs source on the driver's corpus —
    # the condition under which the recursive-CTE oracle applies
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    lsh = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in dedup_clusters(docs, threshold=0.8).collect()
    }
    exact = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in dedup_clusters(
            docs, threshold=0.8, pair_source="exact"
        ).collect()
    }
    assert lsh == exact


def test_star_contraction_closes_long_chain(spark):
    # a 120-node path graph: label propagation needs O(diameter) = 120
    # rounds (far past its cap); star contraction closes in O(log² n)
    from etl_gcp_spark.operators.graph import connected_components_star

    verts = spark.createDataFrame([Row(id=i) for i in range(120)])
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(119)]
    )
    out = connected_components_star(verts, edges)
    rows = {r.id: r.component for r in out.collect()}
    assert len(rows) == 120
    assert set(rows.values()) == {0}


def test_star_contraction_matches_propagation(spark):
    import random

    from etl_gcp_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    n = 60
    edges = [
        Row(src=rng.randrange(n), dst=rng.randrange(n)) for _ in range(45)
    ]
    verts = spark.createDataFrame([Row(id=i) for i in range(n)])
    e = spark.createDataFrame(edges)
    prop = {
        r.id: r.component for r in connected_components(verts, e).collect()
    }
    star = {
        r.id: r.component
        for r in connected_components_star(verts, e).collect()
    }
    assert prop == star


def test_embedding_dedup_clusters_transitive(spark):
    # a-b and b-c similar, a-c not: one cluster {a,b,c} labeled min id;
    # the orthogonal vector stays a singleton
    from pyspark.sql import Row

    from etl_gcp_spark.operators.graph import embedding_dedup_clusters

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.4359, 0.0]),   # cos(1,2)~0.9
            Row(vec_id=3, embedding=[0.62, 0.785, 0.0]),   # cos(2,3)~0.9, cos(1,3)~0.62
            Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),      # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in embedding_dedup_clusters(
        emb, threshold=0.85, n_blocks=3).collect()}
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].cluster_size == 3
    assert out[4].cluster_id == 4 and out[4].cluster_size == 1


def test_dedup_clusters_star_engine_matches_propagation(spark, sf_dir):
    from etl_gcp_spark.operators.graph import dedup_clusters
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    prop = sorted(map(tuple, dedup_clusters(docs, threshold=0.8).collect()))
    star = sorted(
        map(
            tuple,
            dedup_clusters(docs, threshold=0.8, cc_engine="star").collect(),
        )
    )
    assert prop == star and prop


def test_triangle_participation_counts(spark):
    from etl_gcp_spark.operators.graph import triangle_participation

    # K4 on {1,2,3,4}: 4 triangles, each vertex in C(3,2)=3 of them;
    # pendant edge 4-5 adds no triangle; edges arrive unordered/dup'd
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (3, 2),  # duplicate, reversed
            (4, 5),  # pendant
        ],
        "id1 long, id2 long",
    )
    out = {r.doc_id: r.n_triangles for r in triangle_participation(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_participation_chain_has_none(spark):
    from etl_gcp_spark.operators.graph import triangle_participation

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id1 long, id2 long"
    )
    assert triangle_participation(chain).count() == 0


def test_kcore_embedding_graph_invariants(spark, sf_dir):
    """Every core node meets the degree floor, extra rounds past the
    fixpoint change nothing, and a higher core_k yields a subset."""
    from etl_gcp_spark.operators.graph import kcore_embedding_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    core3 = {
        r.vec_id: r.core_degree
        for r in kcore_embedding_graph(
            emb, k=5, core_k=3, rounds=16
        ).collect()
    }
    assert core3 and all(d >= 3 for d in core3.values())
    # fixpoint: doubling the round bound is a no-op
    core3b = {
        r.vec_id: r.core_degree
        for r in kcore_embedding_graph(
            emb, k=5, core_k=3, rounds=32
        ).collect()
    }
    assert core3 == core3b
    # the 4-core (possibly empty) lives inside the 3-core
    core4 = {
        r.vec_id
        for r in kcore_embedding_graph(
            emb, k=5, core_k=4, rounds=16
        ).collect()
    }
    assert core4 <= set(core3)


def test_ensemble_near_dup_unions_signals(spark):
    """A doc chained to a lexical twin AND a semantic twin pulls all
    three into ONE cluster — the union property neither signal alone
    produces."""
    from pyspark.sql import Row

    from etl_gcp_spark.operators.graph import ensemble_near_dup_clusters

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon"),  # lexical twin of 1
            Row(doc_id=3, text="totally different words here now"),
            Row(doc_id=4, text="unrelated content about gardens"),
        ]
    )
    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=3, embedding=[0.0, 0.999, 0.04, 0.0]),  # semantic twin of 2
            Row(vec_id=4, embedding=[0.0, 0.0, 0.0, 1.0]),
        ]
    )
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in ensemble_near_dup_clusters(
            docs, emb, jaccard_threshold=0.8, cosine_threshold=0.9
        ).collect()
    }
    # 1~2 lexically, 2~3 semantically -> {1,2,3} one cluster, 4 alone
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[4] == (4, 1)
