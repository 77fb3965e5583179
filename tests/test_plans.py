"""Physical-plan shape assertions — the 100 TB contract.

Correctness tests prove the small-SF answer; these prove the PLAN is
the one that survives a 1000-executor scale-up: dimension joins
broadcast, filters/pruning reach the parquet scan, top-k avoids global
sorts, JVM-path operators stay out of Python, window stages reuse one
exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_spark.operators.events import sessionize
from etl_gcp_spark.operators.relational import (
    regional_revenue,
    shipping_priority,
    top_customers,
)
from etl_gcp_spark.operators.text_dedup import minhash_signatures
from etl_gcp_spark.sources.readers import load_table, load_tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(df) -> str:
    """Full formatted explain — survives AQE string truncation."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(
        regional_revenue(
            t["region"], t["nation"], t["customer"],
            t["orders"], t["lineitem"], t["supplier"],
        )
    )
    # every dimension join is a broadcast join; the only sort-merge /
    # shuffled join allowed is the fact-fact orders ⋈ lineitem
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    # column pruning: the scan's ReadSchema carries only the 2 columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(top_customers(t["customer"], t["orders"], k=10))
    assert "TakeOrderedAndProject" in plan


def test_q3_customer_broadcast(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(shipping_priority(t["customer"], t["orders"], t["lineitem"]))
    assert "BroadcastHashJoin" in plan


def test_minhash_has_single_exchange(spark, sf_dir):
    """The signature stage must shuffle ONCE (the groupBy(id)); the
    hashing itself is map-side."""
    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(minhash_signatures(docs, num_perm=16))
    assert plan.count("Exchange") == 1


def test_jvm_operators_have_no_python_stage(spark, sf_dir):
    """Everything except the multimodal Pandas-UDF kernels must stay
    JVM-side: no BatchEvalPython / ArrowEvalPython / MapInPandas."""
    t = load_tables(spark, sf_dir)
    for df in (
        top_customers(t["customer"], t["orders"]),
        minhash_signatures(t["documents"]),
        sessionize(t["events"].limit(100)),
    ):
        plan = _plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """lag-window, running-sum window and the session aggregation all
    partition by user_id — Spark must plan ONE exchange, reused."""
    ev = load_table(spark, sf_dir, "events")
    plan = _plan(sessionize(ev))
    assert plan.count("Exchange") == 1


def test_q7_double_nation_broadcast(spark, sf_dir):
    from etl_gcp_spark.operators.relational import nation_trade_volume

    t = load_tables(spark, sf_dir)
    plan = _plan(
        nation_trade_volume(
            t["supplier"], t["lineitem"], t["orders"], t["customer"], t["nation"]
        )
    )
    # supplier, customer, and BOTH nation aliases broadcast; the only
    # shuffled join is the lineitem ⋈ orders fact join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q19_single_join_with_or_residual(spark, sf_dir):
    from etl_gcp_spark.operators.relational import disjunctive_revenue

    t = load_tables(spark, sf_dir)
    plan = _plan(disjunctive_revenue(t["lineitem"], t["part"]))
    # the OR'd brand/size/qty branches must NOT explode into a union of
    # scans: one scan of lineitem, one broadcast join, OR as residual
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Scan parquet") == 2


def test_q21_no_fact_self_join(spark, sf_dir):
    from etl_gcp_spark.operators.relational import waiting_suppliers

    t = load_tables(spark, sf_dir)
    plan = _plan(
        waiting_suppliers(t["supplier"], t["lineitem"], t["orders"], t["nation"])
    )
    # EXISTS/NOT EXISTS expressed as one per-order aggregate join-back:
    # lineitem is scanned once, not three times
    assert plan.count("Scan parquet") <= 4  # lineitem, orders, supplier, nation
    assert "TakeOrderedAndProject" in plan


def test_q16_not_in_is_broadcast_anti(spark, sf_dir):
    from etl_gcp_spark.operators.relational import supplier_part_variety

    t = load_tables(spark, sf_dir)
    plan = _plan(supplier_part_variety(t["lineitem"], t["part"], t["supplier"]))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_q15_aggregates_once_no_self_join(spark, sf_dir):
    from etl_gcp_spark.operators.relational import top_revenue_suppliers

    t = load_tables(spark, sf_dir)
    plan = _plan(top_revenue_suppliers(t["lineitem"], t["supplier"]))
    # the view + scalar-max subquery must not rescan lineitem: one
    # lineitem scan, max as a broadcast scalar, supplier broadcast
    assert plan.count("Scan parquet") <= 3  # lineitem (+reused), supplier
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the date range reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q11_semi_join_and_broadcast_scalar(spark, sf_dir):
    from etl_gcp_spark.operators.relational import important_parts

    t = load_tables(spark, sf_dir)
    plan = _plan(important_parts(t["lineitem"], t["supplier"], t["nation"]))
    # nation suppliers reach lineitem as a broadcast LEFT SEMI (no row
    # duplication); the national total is a broadcast scalar
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q12_conditional_counts_one_pass(spark, sf_dir):
    from etl_gcp_spark.operators.relational import shipmode_priority_counts

    t = load_tables(spark, sf_dir)
    plan = _plan(shipmode_priority_counts(t["lineitem"], t["orders"]))
    # both priority counts ride one grouped pass with map-side combine
    assert "partial_sum" in plan
    # the shipdate year window reaches the lineitem parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_value_distribution_single_window_pass(spark, sf_dir):
    from etl_gcp_spark.operators.relational import order_value_distribution

    t = load_tables(spark, sf_dir)
    plan = _plan(order_value_distribution(t["orders"]))
    # ntile + percent_rank + cume_dist share one window spec:
    # exactly one shuffle and one Window operator, partitioned (no
    # global single-partition sort)
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_q20_nested_in_is_two_semi_joins(spark, sf_dir):
    from etl_gcp_spark.operators.relational import bulk_shippers

    t = load_tables(spark, sf_dir)
    plan = _plan(
        bulk_shippers(t["supplier"], t["nation"], t["lineitem"], t["part"])
    )
    # both INs become semi joins; neither input is duplicated
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan


def test_zscore_outliers_broadcasts_moments(spark, sf_dir):
    from etl_gcp_spark.operators.quality import zscore_outliers

    t = load_tables(spark, sf_dir)
    plan = _plan(
        zscore_outliers(
            t["orders"], "o_totalprice", ["o_orderpriority"],
            z_threshold=1.5,
        )
    )
    # the per-group moment table must come back as a broadcast join —
    # the fact side is never shuffled on the group key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dup_count_exchange_carries_digest_only(spark, sf_dir):
    """The D2 metric shuffles (digest, count), never the payload: the
    exchange's partial-aggregate schema must hold exactly the two
    64-bit digest halves and the partial count — a 16-column lineitem
    costs the same shuffle bytes as a 2-column table."""
    import re

    from etl_gcp_spark.operators.dedup import dup_count

    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan_formatted(dup_count(li))
    # first Exchange block: its Input must be exactly the two digest
    # grouping expressions plus the 8-byte partial count — 3 columns,
    # no l_* payload attribute
    blocks = re.split(r"\n\(\d+\) ", plan)
    exchange = next(b for b in blocks if b.startswith("Exchange"))
    input_line = next(
        ln for ln in exchange.splitlines() if ln.startswith("Input")
    )
    assert input_line.startswith("Input [3]"), input_line
    assert "l_orderkey" not in input_line and "l_comment" not in input_line
    assert "hashpartitioning(_groupingexpression" in exchange


def test_embedding_near_dup_lsh_shuffles_ids_not_vectors(spark, sf_dir):
    """The LSH variant's candidate join must shuffle (tbl, bkt, id)
    only — embeddings re-attach AFTER the pair dedup, and the exact
    verification runs in one Arrow-batched kernel."""
    from etl_gcp_spark.functions.similarity import embedding_near_dup_pairs

    import re

    emb = load_table(spark, sf_dir, "embeddings")
    # engine="lsh": this test asserts the BANDING plan shape; at
    # θ=0.45 the auto dispatcher would route to the blocked GEMM
    plan = _plan_formatted(
        embedding_near_dup_pairs(
            emb, threshold=0.45, n_planes=3, n_tables=16, engine="lsh"
        )
    )
    # NO exchange may carry the vector payload: vectors cross the
    # Arrow boundary map-side (bucketing) and re-attach only after the
    # candidate dedup — whether the bucket join shuffles or broadcasts
    blocks = re.split(r"\n\(\d+\) ", plan)
    exchanges = [b for b in blocks if b.startswith("Exchange")]
    assert exchanges, "expected at least the candidate-dedup exchange"
    for b in exchanges:
        input_line = next(
            ln for ln in b.splitlines() if ln.startswith("Input")
        )
        assert "__v" not in input_line and "embedding" not in input_line
        # the candidate dedup is a pure distinct: no first() buffers
        assert "first" not in input_line
    # Arrow boundaries: the GEMM bucketing kernel (planned ONCE —
    # the bucketed frame is persisted, so both join sides read the
    # cached relation) and the exact-verification kernel — nothing
    # else drops to Python
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2


def test_simhash_pairs_filters_before_dedup_exchange(spark, sf_dir):
    """hamming <= d must be applied below the candidate dedup's
    exchange, so only qualifying pairs shuffle; the dedup itself is a
    full-row distinct (codegen HashAggregate, no first())."""
    from etl_gcp_spark.operators.text_dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(simhash_pairs(docs))
    assert "ObjectHashAggregate" not in plan
    # the hamming filter exists and no 'first(' aggregate survives
    assert "first(" not in plan


def test_jdbc_partitioned_read_plans_range_scan(spark):
    """The partitioned JDBC read must produce a JDBC relation scan
    (pushdown-capable), split into the requested partition count."""
    from etl_gcp_spark.sources.jdbc import (
        DERBY_EMBEDDED_DRIVER,
        derby_memory_url,
        read_jdbc,
        write_jdbc,
    )
    from pyspark.sql import Row

    url = derby_memory_url("planchk")
    write_jdbc(
        spark.createDataFrame([Row(k=i, v=i * 2) for i in range(10)]),
        url,
        "T_PLAN",
        mode="overwrite",
        driver=DERBY_EMBEDDED_DRIVER,
    )
    df = read_jdbc(
        spark, url, "T_PLAN",
        partition_column="K", lower_bound=0, upper_bound=10,
        num_partitions=3, driver=DERBY_EMBEDDED_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 3
    filtered = df.filter(F.col("k") > 5)
    plan = _plan(filtered)
    # the relation is a JDBC scan and the filter is pushed to it
    assert "JDBCRelation" in plan and "PushedFilters" in plan


def test_fuzzy_d2_plans_equi_join_and_narrow_dedup(spark, sf_dir):
    """The deletion-neighborhood join must be an equi-join on the key
    (never a cartesian/nested-loop), and the pair dedup must be a
    bare (id1, id2) distinct — no first() buffers, no text columns
    riding the exchange."""
    import re

    from etl_gcp_spark.operators.linkage import fuzzy_pairs

    cust = load_tables(spark, sf_dir)["customer"]
    plan = _plan_formatted(
        fuzzy_pairs(cust, "c_custkey", "c_name", max_distance=2)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if not b.startswith("Exchange"):
            continue
        input_line = next(
            ln for ln in b.splitlines() if ln.startswith("Input")
        )
        assert "first" not in input_line
        # the candidate-dedup exchange carries ids only, never c_name
        if "hashpartitioning(id1" in b:
            assert "c_name" not in input_line and "__t" not in input_line


def test_pq_scoring_exchange_carries_codes_not_vectors(spark, sf_dir):
    """PQ-ADC's scoring join: the corpus side of every exchange must
    carry (id, subspace, code) narrow rows — the embedding vectors
    never cross an exchange after encoding."""
    import re

    from etl_gcp_spark.functions.similarity import pq_topk
    from etl_gcp_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan_formatted(pq_topk(emb, query_ids=list(range(10)), k=5))
    blocks = re.split(r"\n\(\d+\) ", plan)
    exchanges = [b for b in blocks if b.startswith("Exchange")]
    assert exchanges
    for b in exchanges:
        input_line = next(
            ln for ln in b.splitlines() if ln.startswith("Input")
        )
        assert "embedding" not in input_line and "__v" not in input_line


def test_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    """One Lloyd assignment pass must plan as scan → MapInPandas with
    no exchange at all — the centroid matrix travels by broadcast
    variable, not join."""
    import numpy as np

    from etl_gcp_spark.functions.similarity import (
        _as_double,
        _assign_to_centroids,
    )
    from etl_gcp_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("__v")
    )
    rows = base.orderBy("vec_id").limit(4).collect()
    cmat = np.asarray([list(r["__v"]) for r in rows])
    plan = _plan_formatted(
        _assign_to_centroids(base, cmat, [1, 2, 3, 4], "vec_id")
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_zorder_key_stays_jvm_and_codegen(spark, sf_dir):
    from etl_gcp_spark.operators.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    df = zorder_key(orders, ["o_custkey", "o_totalprice"])
    plan = _plan(df)
    # pure Column arithmetic: no Python stage, the 1-row stats frame
    # joins by broadcast, and the interleave is flat shift/mask
    # expressions in the projection (codegen-compiled at runtime)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "shiftleft" in plan and "shiftright" in plan


def test_dup_ngram_exchanges_carry_hash_not_text(spark, sf_dir):
    from etl_gcp_spark.operators.text_dedup import dup_ngram_fraction

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan_formatted(dup_ngram_fraction(docs))
    # every Exchange below the gram explode keys on the 8-byte hash;
    # the gram text (__g) must not survive into any exchange
    for chunk in plan.split("Exchange")[1:]:
        args = chunk.splitlines()[0]
        assert "__g" not in args
    assert "xxhash64" in plan


def test_boilerplate_strip_broadcasts_flagged_set(spark, sf_dir):
    from etl_gcp_spark.operators.corpus import boilerplate_strip

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(boilerplate_strip(docs, min_docs=2))
    # membership probe is a broadcast join (the flagged set is the
    # output of a corpus-wide aggregation, small by construction)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_pagerank_rank_frames_broadcast(spark, sf_dir):
    from etl_gcp_spark.operators.graph import event_transition_pagerank

    events = load_table(spark, sf_dir, "events")
    plan = _plan(event_transition_pagerank(events))
    # the rank/contribution joins all broadcast the |V|-sized side;
    # the only big shuffles are the window pass and the edge groupBy
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_bm25_topk_is_take_ordered_and_filters_early(spark, sf_dir):
    from etl_gcp_spark.functions.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(bm25_topk(docs, ["spark", "vector"], k=10))
    # top-k must be TakeOrderedAndProject, never a global Sort+Limit
    assert "TakeOrderedAndProject" in plan
    # the query-term probe runs as a plain Filter (codegen isin)
    # before any aggregation -- no join against a term table
    assert plan.count("SortMergeJoin") == 0


def test_shingle_cosine_exchange_carries_hash_not_text(spark, sf_dir):
    from etl_gcp_spark.operators.text_dedup import shingle_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan_formatted(shingle_cosine_pairs(docs, threshold=0.5))
    # posting joins are keyed on the 8-byte xxhash64; the raw shingle
    # string never survives into an exchange
    assert "xxhash64" in plan
    assert "Exchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "__s" not in line


def test_cms_sketch_plan_has_no_python_and_tiny_shuffle(spark, sf_dir):
    from etl_gcp_spark.functions.sketches import cms_build

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(cms_build(ev, "user_id"))
    # pure codegen arithmetic: no Arrow/Python stage anywhere
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    # one partial+final aggregate pair over (row, bucket)
    assert "HashAggregate" in plan


def test_logreg_gradient_aggregates_map_side(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gcp_spark.operators.classifier import (
        doc_feature_table,
        train_logreg,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = doc_feature_table(
        docs, label=(F.col("lang") == "en").cast("double")
    )
    plan = _plan(train_logreg(feats, n_steps=1))
    # the gradient reduction is a partial/final HashAggregate pair --
    # the shuffle carries 4 decimal partials + a count, never rows
    assert "HashAggregate" in plan
    assert "BroadcastExchange" in plan  # weights ride a broadcast


def test_zorder_point_predicate_prunes_most_files(spark, sf_dir, tmp_path):
    """The 100x-scale payoff of the Z-order layout: a two-dimensional
    point predicate must be skippable by per-file footer stats on BOTH
    curve dimensions at once — fewer than 1/4 of the files may overlap
    the predicate box (a single-column sort leaves the second
    dimension's per-file range spanning the whole domain, pruning
    nothing). Also asserts Spark pushes both predicates to the scan,
    so the footer stats are actually consulted at runtime."""
    import glob
    import os

    import pyarrow.parquet as pq

    from etl_gcp_spark.operators.layout import write_zordered

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zorders")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=16)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 12  # layout actually fanned out

    # point predicate: one real row's custkey plus a tight price band
    probe = orders.orderBy("o_orderkey").first()
    ck = probe["o_custkey"]
    lo, hi = probe["o_totalprice"] - 1.0, probe["o_totalprice"] + 1.0

    def overlaps(f: str) -> bool:
        meta = pq.ParquetFile(f).metadata
        cols = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        ck_min = min(
            meta.row_group(g).column(cols["o_custkey"]).statistics.min
            for g in range(meta.num_row_groups)
        )
        ck_max = max(
            meta.row_group(g).column(cols["o_custkey"]).statistics.max
            for g in range(meta.num_row_groups)
        )
        p_min = min(
            meta.row_group(g).column(cols["o_totalprice"]).statistics.min
            for g in range(meta.num_row_groups)
        )
        p_max = max(
            meta.row_group(g).column(cols["o_totalprice"]).statistics.max
            for g in range(meta.num_row_groups)
        )
        return ck_min <= ck <= ck_max and not (hi < p_min or lo > p_max)

    n_overlap = sum(1 for f in files if overlaps(f))
    assert n_overlap < len(files) / 4, (
        f"{n_overlap}/{len(files)} files overlap the point predicate — "
        "the curve layout is not delivering multi-dimensional pruning"
    )

    # the scan side: both predicates pushed, so the runtime reader can
    # skip those files/row-groups via exactly these footer stats
    scan = (
        spark.read.parquet(path)
        .filter((F.col("o_custkey") == ck) & F.col("o_totalprice").between(lo, hi))
        .select("o_orderkey")
    )
    plan = _plan(scan)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "o_custkey" in pushed and "o_totalprice" in pushed


def test_ivf_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The persisted IVF index's layout IS the index: a query that
    probes n_probe of n_cells cells must plan a scan with
    PartitionFilters on the cell directory column — serving I/O is
    n_probe/n_cells of the corpus with no custom reader."""
    from etl_gcp_spark.functions.similarity import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfidx")
    build_ivf_index(emb, path, n_cells=8, n_iters=1)
    vectors = spark.read.parquet(path + "/vectors")
    pruned = vectors.filter(F.col("cell").isin([1, 3])).select("vec_id")
    plan = _plan(pruned)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan


def test_ivf_filtered_serve_prunes_and_pushes(spark, sf_dir, tmp_path):
    """Filtered vector search must compose BOTH scan reductions in
    one plan: PartitionFilters on the probed cells (directory-level
    pruning) AND PushedFilters on the metadata predicate (row-group
    stats / dictionary skipping inside the probed cells). A metadata
    join or post-retrieval filter would show neither."""
    from etl_gcp_spark.functions.similarity import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivffilt")
    build_ivf_index(emb, path, n_cells=8, n_iters=1, meta_cols=("label",))
    vectors = spark.read.parquet(path + "/vectors")
    pruned = (
        vectors.filter(F.col("cell").isin([1, 3]))
        .filter(F.col("label") == 1)
        .select("vec_id")
    )
    plan = _plan(pruned)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan
    assert "label" in pushed, plan


def test_ivf_filtered_topk_respects_predicate(spark, sf_dir, tmp_path):
    """Every served neighbor satisfies the predicate; queries are
    looked up unfiltered (a query whose own label != 1 still gets
    answers); per-query result counts are ≤ k."""
    from etl_gcp_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivffilt2")
    build_ivf_index(emb, path, n_cells=8, n_iters=1, meta_cols=("label",))
    out = ivf_index_topk(
        spark, path, query_ids=list(range(6)), k=3, n_probe=3,
        neighbor_pred=(F.col("label") == 1),
    ).collect()
    assert out, "filtered serve returned nothing"
    allowed = {
        r["vec_id"]
        for r in emb.filter(F.col("label") == 1).select("vec_id").collect()
    }
    import collections

    per_q = collections.Counter()
    for r in out:
        assert r["neighbor_id"] in allowed
        per_q[r["query_id"]] += 1
    assert all(c <= 3 for c in per_q.values())
    # unfiltered serve over the same artifact must be unaffected by
    # the metadata column riding along in the payload
    base = ivf_index_topk(
        spark, path, query_ids=list(range(6)), k=3, n_probe=3
    ).collect()
    assert len(base) == 18


def test_ivf_erasure_lifecycle_and_pruned_tombstone_serve(
    spark, sf_dir, tmp_path
):
    """The vector-side erasure lifecycle: tombstoned vectors leave
    the servable set immediately (as neighbors and as queries);
    the tombstone serve keeps PartitionFilters on cell (the
    broadcast anti-join composes under the cell filter); compaction
    makes the erasure physical (ids gone from the rewritten cells,
    tombstone dir cleared) and serving is unchanged."""
    import os

    from etl_gcp_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_compact,
        ivf_index_erase,
        ivf_index_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivferase")
    build_ivf_index(emb, path, n_cells=8, n_iters=1)
    ivf_index_erase(
        spark, path, emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    )
    out = ivf_index_topk(
        spark, path, query_ids=list(range(10)), k=3, n_probe=3
    ).collect()
    assert out
    qs = {r["query_id"] for r in out}
    assert 0 not in qs and 7 not in qs  # erased queries gone
    assert all(r["neighbor_id"] % 7 != 0 for r in out)
    # pruning survives the tombstone anti-join
    tomb = spark.read.parquet(path + "/tombstones").select("vec_id")
    vectors = spark.read.parquet(path + "/vectors").join(
        F.broadcast(tomb), "vec_id", "left_anti"
    )
    plan = _plan(vectors.filter(F.col("cell").isin([1, 3])).select("vec_id"))
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan
    ivf_index_compact(spark, path)
    assert not os.path.isdir(path + "/tombstones")
    kept = spark.read.parquet(path + "/vectors")
    assert kept.filter(F.col("vec_id") % 7 == 0).count() == 0
    after = ivf_index_topk(
        spark, path, query_ids=list(range(10)), k=3, n_probe=3
    ).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, out))


def test_ivf_filtered_serve_composes_with_erasure(spark, sf_dir, tmp_path):
    """Filter × erasure composition on the vector index: a filtered
    serve over a tombstoned artifact returns only neighbors that
    satisfy the predicate AND survive the erasure, and erased ids
    stay unservable as queries."""
    from etl_gcp_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_erase,
        ivf_index_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivffe")
    build_ivf_index(emb, path, n_cells=8, n_iters=1, meta_cols=("label",))
    ivf_index_erase(
        spark, path, emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    )
    out = ivf_index_topk(
        spark, path, query_ids=list(range(10)), k=3, n_probe=3,
        neighbor_pred=(F.col("label") == 1),
    ).collect()
    assert out
    allowed = {
        r["vec_id"]
        for r in emb.filter(
            (F.col("label") == 1) & (F.col("vec_id") % 7 != 0)
        ).select("vec_id").collect()
    }
    qs = {r["query_id"] for r in out}
    assert 0 not in qs and 7 not in qs
    assert all(r["neighbor_id"] in allowed for r in out)


def test_ivf_append_tree_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The streaming append trees keep the same pruning contract as
    the base tree: a probed-cell read over appends/batch=N/cell=M
    plans PartitionFilters on cell — the batch level adds files, not
    read amplification."""
    from etl_gcp_spark.streaming.vectors import run_streaming_ivf_ingest

    root = str(tmp_path / "ivf_plan_appends")
    run_streaming_ivf_ingest(
        spark,
        f"{sf_dir}/embeddings.parquet",
        n_batches=2,
        n_cells=8,
        n_iters=1,
        query_ids=[0],
        k=3,
        n_probe=2,
        root=root,
    )
    appends = f"{root}/index/appends"
    tree = spark.read.option("basePath", appends).parquet(appends)
    pruned = tree.filter(F.col("cell").isin([1, 3])).select("vec_id")
    plan = _plan(pruned)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan


def test_text_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The persisted inverted index's layout IS the index: a BM25
    serve probing the query terms' buckets must plan the postings
    scan with PartitionFilters on the bucket directory column —
    serving I/O is |query buckets|/n_buckets of the postings."""
    from etl_gcp_spark.functions.text import poly_hash_py, text_index_build

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "textidx")
    text_index_build(docs, path, n_buckets=64)
    buckets = sorted(
        {poly_hash_py(t) % 64 for t in ["spark", "vector", "stream"]}
    )
    postings = spark.read.parquet(path + "/postings").filter(
        F.col("bucket").isin(buckets)
    )
    plan = _plan(postings)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in part_filters, plan


def test_bm25_filtered_postings_scan_prunes_and_pushes(
    spark, sf_dir, tmp_path
):
    """Filtered retrieval composes BOTH scan reductions in one plan:
    PartitionFilters on the query terms' buckets AND PushedFilters on
    the document attribute (lang) denormalized into the postings rows
    — a forward-index join or post-scoring filter would show
    neither."""
    from etl_gcp_spark.functions.text import poly_hash_py, text_index_build

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "textfidx_plan")
    text_index_build(docs, path, n_buckets=64, meta_cols=("lang",))
    buckets = sorted(
        {poly_hash_py(t) % 64 for t in ["spark", "vector", "stream"]}
    )
    postings = (
        spark.read.parquet(path + "/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("lang") == "en")
        .select("doc_id", "tf")
    )
    plan = _plan(postings)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "bucket" in part_filters, plan
    assert "lang" in pushed, plan


def test_scaled_embedding_entries_explode_without_new_exchange(
    spark, sf_dir
):
    """The round-5 driver-shape fix (standardize/robust_scale registry
    entries explode vectors to (vec_id, pos, value) scalar rows) must
    cost a Generate projection, NOT a shuffle: the data pass stays
    scan → broadcast-cross-join with the packed dim stats → project →
    Generate, and the only Exchanges in the whole plan belong to the
    dim-row stats aggregation (shuffle volume ≤ dim rows per
    partition at any corpus size). An Exchange after the Generate
    would mean the reshape re-partitions the full exploded output —
    n·dim rows — which would not survive 100 TB."""
    import re

    import __spark_entry__ as entrymod

    for name in ("standardize_embeddings", "robust_scale_embeddings"):
        df = entrymod.queries()[name](spark, sf_dir)
        plan = _plan_formatted(df)
        tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
        assert "Generate" in tree, f"{name}: explode missing\n{tree}"
        assert "BroadcastNestedLoopJoin" in tree, f"{name}:\n{tree}"
        # nothing above (= downstream of) the top Generate except the
        # AQE wrapper — in the indented tree, the Generate node sits
        # at depth 0 right under AdaptiveSparkPlan
        top = [
            ln for ln in tree.splitlines()
            if ln.startswith("+- ") or ln.startswith("   +- Generate")
        ]
        assert any("Generate" in ln for ln in top[:2]), (
            f"{name}: Generate is not the plan root\n{tree}"
        )
        # exchanges only on the stats side: ≤ 2 (partial→final agg +
        # the broadcast), and none between the cross join and Generate
        n_exchange = len(re.findall(r"\bExchange\b", tree))
        assert n_exchange <= 2, f"{name}: {n_exchange} exchanges\n{tree}"


def test_gemm_drift_scoring_has_no_shuffle_before_aggregation(
    spark, sf_dir
):
    """ivf_drift_report_gemm's scoring pass must be scan →
    MapInPandas (broadcast centroids ride the closure, not a join) →
    project; every Exchange in the plan belongs to the tiny cohort
    aggregation (≤ distinct 6-dp sims per cohort after the groupBy
    compaction). A join or exchange feeding the Python stage would
    mean the scorer reshuffles the full corpus."""
    from etl_gcp_spark.functions.similarity import ivf_drift_report_gemm
    from etl_gcp_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan_formatted(ivf_drift_report_gemm(emb))
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    lines = tree.splitlines()
    scorer_lines = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
    assert scorer_lines, tree
    # each scorer consumes the scan directly: its subtree (the lines
    # immediately following, until the branch bottoms out at the
    # parquet scan) is Project → Scan — no Exchange, no join feeding
    # the Python stage
    for i in scorer_lines:
        # feeder subtree: Project [-> ColumnarToRow] -> Scan parquet
        feeder = lines[i + 1 : i + 4]
        assert any("Scan parquet" in ln for ln in feeder), (
            f"MapInPandas not scan-fed:\n{tree}"
        )
        assert all(
            "Exchange" not in ln and "Join" not in ln for ln in feeder
        ), tree
    # the scored frame is persisted, so the corpus-scoring pass runs
    # once even though two aggregation subtrees consume it
    assert "InMemoryRelation" in tree, tree


def test_index_maintenance_audit_appends_without_rewriting(
    spark, sf_dir, tmp_path
):
    """The maintenance leg must be O(|delta|): building writes the
    base snapshot's banded rows once, appending writes ONLY the
    delta's rows as new files (the base files' mtimes are untouched),
    and the audit's only-counts are structural zeros."""
    import os

    from etl_gcp_spark.operators.text_dedup import (
        dedup_index_maintenance_audit,
    )
    from etl_gcp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "lsh_idx")
    row = dedup_index_maintenance_audit(docs, idx).collect()[0]
    assert row["n_only_index"] == 0 and row["n_only_rebuild"] == 0
    assert row["n_pairs_index"] == row["n_pairs_rebuild"]
    # the banded dir holds base files + appended delta files; rerun
    # the append alone and confirm base files are not rewritten
    bands_dir = os.path.join(idx, "bands")
    files_before = {
        f: os.path.getmtime(os.path.join(bands_dir, f))
        for f in os.listdir(bands_dir)
        if f.endswith(".parquet")
    }
    from pyspark.sql import functions as F

    from etl_gcp_spark.operators.text_dedup import _banded

    delta = docs.filter(F.col("doc_id") % 10 == 0)
    _banded(
        delta, num_perm=16, bands=4, n=3,
        text_col="text", id_col="doc_id",
    ).write.mode("append").parquet(bands_dir)
    for f, mtime in files_before.items():
        path = os.path.join(bands_dir, f)
        assert os.path.exists(path), f"append rewrote {f}"
        assert os.path.getmtime(path) == mtime, f"append rewrote {f}"


def test_streamed_text_append_tree_scan_is_partition_pruned(
    spark, sf_dir, tmp_path
):
    """The streamed postings append trees keep the same pruning
    contract as the base postings tree: a probed-bucket read over
    appends/postings/batch=N/bucket=B plans PartitionFilters on
    bucket — the batch level adds files, not read amplification."""
    from etl_gcp_spark.streaming.text import run_streaming_text_ingest

    root = str(tmp_path / "text_plan_appends")
    run_streaming_text_ingest(
        spark,
        f"{sf_dir}/documents.parquet",
        ["spark", "vector"],
        n_batches=2,
        root=root,
        k=5,
    )
    appends = f"{root}/index/appends/postings"
    tree = spark.read.option("basePath", appends).parquet(appends)
    pruned = tree.filter(F.col("bucket").isin([1, 3])).select("doc_id")
    plan = _plan(pruned)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in part_filters, plan


def test_ivf_retrain_swap_rebuilds_pruned_artifact(spark, sf_dir, tmp_path):
    """The drift->retrain ACT edge: after ivf_retrain_swap the
    artifact is a fresh snapshot — appends folded in, tombstoned
    vectors PHYSICALLY gone (dir cleared, training influence
    dropped), metadata columns preserved through the rebuild — and
    the post-swap serve still reads a partition-pruned scan (the
    layout IS the index; a retrain must not cost that property)."""
    import os

    from etl_gcp_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_erase,
        ivf_index_topk,
        ivf_retrain_swap,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfretr")
    build_ivf_index(
        emb.filter(F.col("vec_id") < 400), path,
        n_cells=8, n_iters=1, meta_cols=("label",),
    )
    ivf_index_append(
        spark, path, emb.filter(F.col("vec_id") >= 400),
        meta_cols=("label",),
    )
    ivf_index_erase(
        spark, path, emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    )
    ivf_retrain_swap(spark, path, n_cells=8, n_iters=1)

    assert not os.path.isdir(path + "/tombstones")
    assert not os.path.isdir(path + "/appends")
    kept = spark.read.parquet(path + "/vectors")
    assert "label" in kept.columns  # metadata survived the rebuild
    assert kept.filter(F.col("vec_id") % 7 == 0).count() == 0
    n_surv = emb.filter(F.col("vec_id") % 7 != 0).count()
    assert kept.count() == n_surv
    # retrained centroids are consistent with the rewritten cells:
    # every stored cell label exists in the centroid table
    cells = {r["cell"] for r in kept.select("cell").distinct().collect()}
    cents = {
        r["cell"]
        for r in spark.read.parquet(path + "/centroids").collect()
    }
    assert cells <= cents
    # the post-swap serve keeps PartitionFilters on cell
    out = ivf_index_topk(spark, path, query_ids=[1, 2, 3], k=3, n_probe=3)
    plan = _plan(out)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan
    rows = out.collect()
    assert rows and all(r["neighbor_id"] % 7 != 0 for r in rows)


def test_bitext_ann_candidate_scan_prunes_and_pushes(
    spark, sf_dir, tmp_path
):
    """The ANN bitext candidate leg must compose BOTH scan
    reductions, like every filtered IVF serve: PartitionFilters on
    the probed cells (directory pruning to the union of cells any
    query probes) AND PushedFilters on the side column (row-group
    skipping inside them). A side join or post-retrieval filter
    would show neither."""
    from etl_gcp_spark.functions.similarity import (
        build_ivf_index,
        ivf_cross_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    tagged = emb.withColumn(
        "side",
        F.when(F.col("vec_id") % 2 == 0, F.lit("src")).otherwise(
            F.lit("tgt")
        ),
    )
    path = str(tmp_path / "bitext_plan")
    build_ivf_index(
        tagged, path, n_cells=8, n_iters=1, meta_cols=("side",)
    )
    out = ivf_cross_topk(
        spark, path,
        query_pred=F.col("side") == "src",
        cand_pred=F.col("side") == "tgt",
        k=4, n_probe=2, n_blocks=2,
    )
    plan = _plan_formatted(out)
    # the candidate scan: partition-pruned to probed cells AND
    # side-pushed; scan text appears once per parquet scan, so
    # require a scan line carrying both
    assert any(
        "cell" in seg.splitlines()[0]
        for seg in plan.split("PartitionFilters: ")[1:]
    ), plan
    assert any(
        "side" in seg.splitlines()[0]
        for seg in plan.split("PushedFilters: ")[1:]
    ), plan


def test_decontaminate_bench_grams_broadcast(spark, sf_dir):
    """The benchmark gram set is eval-set-sized and must reach the
    corpus side as a BROADCAST hash join (the corpus gram explode
    never shuffles); a sort-merge join here would shuffle every
    corpus window at 100 TB."""
    from etl_gcp_spark.operators.corpus import decontaminate_docs

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(
        decontaminate_docs(docs, benchmark_source="src0", n=3)
    )
    assert "BroadcastHashJoin" in plan, plan


def test_hamming_lsh_probes_broadcast_no_cartesian(spark, sf_dir):
    """The SRP-LSH serve's candidate join keys on (band, bval) with
    the query probes BROADCAST, and the rescore joins candidates to
    the word table by id — nowhere a cartesian: the full-scan
    hamming_topk's broadcast crossJoin is exactly what the bucketed
    path exists to avoid at corpus scale."""
    from etl_gcp_spark.functions.similarity import hamming_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = hamming_lsh_topk(
        emb, query_ids=list(range(10)), k=5, n_bands=16, band_bits=4
    )
    plan = _plan_formatted(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivf_pq_serve_broadcasts_probe_and_lut_no_cartesian(
    spark, sf_dir
):
    """The fused IVF+PQ serve joins candidates through the broadcast
    probe table and the broadcast ADC LUT; nothing in the serve path
    may shuffle the corpus against itself or fall into a cartesian —
    the float corpus never appears in the plan's join inputs at all
    (codes only)."""
    from etl_gcp_spark.functions.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_pq_topk(emb, query_ids=list(range(10)), k=5)
    plan = _plan_formatted(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivf_pq_residual_serve_broadcasts_no_cartesian(spark, sf_dir):
    """The residual serve path is byte-for-byte the fused serve's
    (codes + broadcast probe/LUT joins) — the qc constant rides the
    probe table, so adding residual encoding must not introduce any
    new join shape."""
    from etl_gcp_spark.functions.similarity import ivf_pq_residual_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_pq_residual_topk(emb, query_ids=list(range(10)), k=5)
    plan = _plan_formatted(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
