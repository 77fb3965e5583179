"""Corpus-level training-data operators: sequence packing and
benchmark-contamination screening.

Neither exists in the reference (it stops at row-level clean/dedup,
`data_loader.py:296-384`); both are table-stakes for assembling LLM
training corpora at scale, and both are pure DataFrame compositions —
no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_gcp_spark.functions.text import tokens
from etl_gcp_spark.operators.text_dedup import with_shingles


def pack_documents(
    documents: DataFrame,
    *,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs, sequentially by
    id WITHIN each shard: pack_id = floor(exclusive-prefix-tokens /
    budget) — the streaming "fill until the budget rolls over" rule.

    Packing is per-shard (one window partition per ``shard_col``
    value), not global: a single global running sum would serialize
    the whole corpus through one partition at 100 TB, while per-shard
    windows parallelize across shards and match how corpora are
    actually sharded. One shuffle on the shard key.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    return (
        documents.select(
            F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens")
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            shard_col,
            "n_tokens",
            F.floor((F.col("__cum") - F.col("n_tokens")) / budget).alias(
                "pack_id"
            ),
        )
    )


def boilerplate_sentences(
    documents: DataFrame,
    *,
    min_docs: int = 3,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus boilerplate detection: sentences repeated across
    ≥ ``min_docs`` distinct documents (navbars, license headers,
    cookie banners — the lines a corpus-cleaning pass strips).

    Sentence split is a JVM-side regex ``split`` + ``explode``; the
    aggregation groups on the sentence text with map-side partials,
    so at 100 TB the shuffle carries one (sentence, partial-count)
    pair per distinct sentence per map task, not one row per
    occurrence. Short fragments are filtered BEFORE the exchange.
    """
    sent = F.explode(F.split(F.col(text_col), r"\. ")).alias("sentence")
    return (
        documents.select(F.col(id_col), sent)
        .select(F.col(id_col), F.trim("sentence").alias("sentence"))
        .filter(F.length("sentence") >= min_len)
        .groupBy("sentence")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def source_mixture_rates(
    documents: DataFrame,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling rates that re-weight the corpus to a
    UNIFORM target mixture: rate = (total/k)/n_source, capped at 1.0
    (undersampled shards are never inflated past their size).

    The per-source counts are one map-side-combined aggregation; the
    scalar (total, k) joins back by broadcast — no second scan of the
    corpus and no driver round-trip, so the plan is identical at
    100 TB. Downstream, ``universe_sample`` applies the rate per
    shard deterministically.
    """
    counts = documents.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            source_col,
            "n_docs",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("__total")
                    / F.col("__k")
                    / F.col("n_docs").cast("double"),
                ),
                6,
            ).alias("sample_rate"),
        )
    )


def contamination_overlap(
    documents: DataFrame,
    *,
    benchmark_source: str = "src0",
    min_shared: int = 5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Benchmark-contamination screen: corpus documents sharing ≥
    ``min_shared`` distinct n-gram shingles with ANY document of the
    held-out benchmark shard.

    The benchmark shingle set is small by construction (eval sets
    are) — it is deduplicated and broadcast, so the corpus side needs
    one scan, one broadcast semi-ish join on the 8-byte shingle hash,
    and one count per doc. No quadratic pair join: overlap is counted
    against the UNION of benchmark shingles, which is what a
    decontamination filter actually thresholds on.
    """
    sh = with_shingles(documents, text_col, id_col, n)
    ids = documents.select(F.col(id_col), F.col(source_col))
    sh = sh.join(ids, id_col)
    posting = sh.select(
        F.col(id_col),
        F.col(source_col),
        F.explode_outer("shingles").alias("shingle"),
    ).select(
        F.col(id_col), F.col(source_col), F.xxhash64("shingle").alias("__h")
    )
    bench = (
        posting.filter(F.col(source_col) == benchmark_source)
        .select("__h")
        .dropDuplicates()
    )
    return (
        posting.filter(F.col(source_col) != benchmark_source)
        .join(F.broadcast(bench), "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_docs(
    documents: DataFrame,
    *,
    benchmark_source: str = "src0",
    n: int = 3,
    max_removed_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """ACT on benchmark contamination — the removal edge the
    detection screens (:func:`contamination_overlap`,
    :func:`contamination_bloom`) stop short of, and the standard
    pretraining decontamination step (GPT-3 appendix C / PaLM:
    excise the n-gram collisions, drop documents that are mostly
    benchmark): every corpus token covered by an n-gram window that
    appears verbatim in the benchmark shard is removed, the document
    is reassembled from the surviving tokens in order, and documents
    whose removed fraction exceeds ``max_removed_frac`` (strict) are
    dropped outright — rewriting a document that IS the benchmark
    leaves unusable fragments.

    Output (scalar-only): (doc_id, n_tokens, n_removed, action,
    clean_text) over every non-benchmark document — ``action`` ∈
    {'keep','rewrite','drop'}; ``clean_text`` is the original text
    for keeps (no rewrite happened, byte-identical), the
    space-joined survivors for rewrites, NULL for drops.

    Scale shape: the benchmark gram set is eval-set-sized by
    construction — deduplicated and BROADCAST (production would hash
    it first; strings keep the op engine-replayable), so the corpus
    side is one scan + one broadcast join on the gram. Only
    documents with hits pay the rewrite: the removed-index set rides
    back on the id and the token filter runs inside the packed row
    (``F.filter`` with the positional lambda — no token explode, no
    shuffle of the text). Docs shorter than ``n`` tokens have no
    windows and pass through as keeps.
    """
    corp = documents.filter(F.col(source_col) != benchmark_source)
    bench_grams = (
        with_shingles(
            documents.filter(F.col(source_col) == benchmark_source),
            text_col,
            id_col,
            n,
        )
        .select(F.explode("shingles").alias("__gram"))
        .dropDuplicates()
    )
    toked = tokenize_docs(corp, id_col=id_col, text_col=text_col)
    grams = doc_gram_posting(toked, n, id_col=id_col)
    removed = removal_index(grams, bench_grams, n, id_col=id_col)
    return apply_removal(
        toked.join(removed, id_col, "left"),
        max_removed_frac,
        id_col=id_col,
        text_col=text_col,
    )


def tokenize_docs(
    documents: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, __toks, __nt) — the token view the decontamination
    steps share (batch :func:`decontaminate_docs` and the streaming
    runner in streaming/text.py)."""
    return documents.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.col(text_col)).alias("__toks"),
    ).withColumn("__nt", F.size("__toks"))


def doc_gram_posting(
    toked: DataFrame, n: int, *, id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, __gram) — every n-token window with its 0-based
    position. try_element_at + the clamped sequence keep the window
    expression TOTAL: codegen common-subexpression elimination can
    evaluate the transform inside the __nt >= n filter's stage (i.e.
    on rows the filter is about to drop), where a plain element_at on
    a sub-n doc throws."""
    tk = F.col("__toks")
    return toked.filter(F.col("__nt") >= n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.col("__nt") - n, F.lit(0))),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.try_element_at(tk, (i + j + 1).cast("int"))
                        for j in range(n)
                    ],
                ),
            )
        ).alias("pos", "__gram"),
    )


def removal_index(
    grams: DataFrame,
    bench_grams: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, __rm) — contaminated 0-based token indexes: the union of
    [pos, pos+n) over every window colliding with the (broadcast)
    benchmark gram set. Overlapping windows merge via the set
    semantics, so downstream counts are tokens, not windows."""
    return (
        grams.join(F.broadcast(bench_grams), "__gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + n - 1)
            ).alias("__idx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__idx").alias("__rm"))
    )


def apply_removal(
    joined: DataFrame,
    max_removed_frac: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The verdict/rewrite step over (id, text, __toks, __nt, __rm):
    (id, n_tokens, n_removed, action, clean_text) — 'drop' past the
    strict removed-fraction threshold (NULL text), 'rewrite' joins
    the surviving tokens in order inside the packed row (positional
    F.filter — no token explode), 'keep' passes the original text
    byte-identical."""
    tk = F.col("__toks")
    staged = joined.withColumn(
        "__nrm",
        F.coalesce(F.size("__rm"), F.lit(0)).cast("long"),
    )
    action = (
        F.when(
            F.col("__nrm") / F.col("__nt").cast("double")
            > max_removed_frac,
            F.lit("drop"),
        )
        .when(F.col("__nrm") > 0, F.lit("rewrite"))
        .otherwise(F.lit("keep"))
    )
    survivors = F.filter(
        tk, lambda t, i: ~F.array_contains(F.col("__rm"), i)
    )
    return staged.select(
        F.col(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        F.col("__nrm").alias("n_removed"),
        action.alias("action"),
        F.when(action == "drop", F.lit(None).cast("string"))
        .when(action == "rewrite", F.concat_ws(" ", survivors))
        .otherwise(F.col(text_col))
        .alias("clean_text"),
    )


# Gopher-style rejection thresholds (Rae et al. 2021, §A1.1 — public
# methodology), adapted to the synthetic corpus's scale. Order matters:
# the FIRST failing rule names the rejection reason.
QUALITY_RULES = (
    ("too_short", "n_tokens < {min_tokens}"),
    ("too_long", "n_tokens > {max_tokens}"),
    ("mean_token_len", "mean_token_len < 2.0 OR mean_token_len > 12.0"),
    ("junk", "junk_ratio > {max_junk_ratio}"),
    ("repetitive_word", "top_word_ratio > {max_top_word_ratio}"),
    ("repetitive_trigram", "dup_trigram_ratio > {max_dup_trigram_ratio}"),
)


def quality_filter(
    documents: DataFrame,
    *,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_junk_ratio: float = 0.2,
    max_top_word_ratio: float = 0.3,
    max_dup_trigram_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keep/drop VERDICT with the first failing rule as
    the reason — the decision layer over :func:`quality_score` and
    :func:`repetition_signals` (which only emit features).

    Output: (doc_id, keep, reason) — ``reason`` NULL for keepers.
    Documents with NULL text are dropped with reason ``'null_text'``.

    Scale shape: the feature frames are narrow (id + doubles), so the
    doc_id join shuffles ~40 bytes/doc; the verdict itself is a
    codegen CASE chain. At 100 TB prefer joining the verdict back to
    the payload over carrying text through the metric computation.
    """
    from etl_gcp_spark.functions.text import quality_score, repetition_signals

    params = dict(
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_junk_ratio=max_junk_ratio,
        max_top_word_ratio=max_top_word_ratio,
        max_dup_trigram_ratio=max_dup_trigram_ratio,
    )
    # quality_score / repetition_signals emit a hardcoded `doc_id`
    # (the Arrow kernel selects it by name), so normalize the caller's
    # id column to doc_id once here and rename back on the way out.
    docs = (
        documents.withColumnRenamed(id_col, "doc_id")
        if id_col != "doc_id"
        else documents
    )
    q = quality_score(docs, text_col=text_col)
    r = repetition_signals(docs, text_col=text_col).select(
        "doc_id", "top_word_ratio", "dup_trigram_ratio"
    )
    feats = (
        docs.select("doc_id")
        .join(q.drop("n_tokens"), "doc_id", "left")
        .join(r, "doc_id", "left")
        .join(
            docs.select(
                "doc_id", F.size(tokens(F.col(text_col))).alias("n_tokens")
            ),
            "doc_id",
            "left",
        )
    )
    reason = F.when(F.col("n_tokens").isNull(), F.lit("null_text"))
    for name, cond in QUALITY_RULES:
        reason = reason.when(
            F.expr(cond.format(**params)), F.lit(name)
        )
    return feats.select(
        F.col("doc_id").alias(id_col),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def curation_funnel(
    documents: DataFrame,
    *,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **filter_kwargs,
) -> DataFrame:
    """End-to-end corpus curation funnel — the assembled pipeline a
    training-data run executes, reported as per-stage survivor counts:

    raw → quality_filter → exact dedup (md5 keep-min-id) →
    near-dup removal (MinHash LSH, greedy lower-id keeper).

    Output: (stage, stage_order, n_docs) — 4 rows. Each stage feeds
    the next, so the counts are monotone non-increasing; the funnel
    is the at-a-glance health report for a curation run (how much did
    each gate remove?).
    """
    from etl_gcp_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        exact_text_dedup,
    )

    verdict = quality_filter(
        documents, text_col=text_col, id_col=id_col, **filter_kwargs
    )
    # the four stage counts execute as ONE union job, and each later
    # stage's subtree contains every earlier stage — without pinning,
    # the quality features recompute 3× and the exact-dedup twice
    # (measured 4.6 s → 2.9 s at sf0.1). What is pinned is narrow:
    # (id, text) survivors, never feature columns.
    kept = documents.join(
        verdict.filter(F.col("keep")).select(id_col), id_col
    ).persist()
    exact_ids = exact_text_dedup(kept, text_col=text_col, id_col=id_col)
    exact_docs = kept.join(exact_ids, id_col).persist()
    pairs = minhash_lsh_pairs(
        exact_docs,
        threshold=jaccard_threshold,
        text_col=text_col,
        id_col=id_col,
    )
    near = exact_docs.join(
        pairs.select(F.col("id2").alias(id_col)).dropDuplicates(),
        id_col,
        "left_anti",
    )

    def stage(df: DataFrame, name: str, order: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(order).alias("stage_order"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    from etl_gcp_spark.caching import tag_pinned, unpersist_pinned  # noqa: F401

    result = (
        stage(documents, "raw", 1)
        .unionByName(stage(kept, "quality_kept", 2))
        .unionByName(stage(exact_docs, "exact_deduped", 3))
        .unionByName(stage(near, "near_deduped", 4))
    )
    # long-lived sessions: release the two pins with
    # etl_gcp_spark.caching.unpersist_pinned(result) after materializing
    return tag_pinned(result, kept, exact_docs)


def mixture_sample(
    documents: DataFrame,
    *,
    budget_fraction: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """APPLY :func:`source_mixture_rates`: deterministically sample
    each source at its uniform-remix rate scaled by
    ``budget_fraction`` (the overall corpus-size budget: 0.5 keeps
    ~half of a balanced corpus, re-balancing skewed sources first).

    The keep/drop decision is the engine-portable Lehmer hash of the
    document id (operators/sampling.py) — the same rows survive on
    every run, partitioning, and engine, so the sample is replayable
    and oracle-checkable. One broadcast join of the (tiny) rate table
    against the corpus; the filter evaluates scan-side.
    """
    from etl_gcp_spark.operators.sampling import hash_bucket

    rates = source_mixture_rates(documents, source_col=source_col).select(
        source_col,
        F.least(
            F.lit(1.0), F.col("sample_rate") * F.lit(budget_fraction)
        ).alias("__rate"),
    )
    return (
        documents.join(F.broadcast(rates), source_col)
        .filter(
            hash_bucket(F.col(id_col), buckets)
            < F.round(F.col("__rate") * buckets).cast("bigint")
        )
        .drop("__rate")
    )


def leakage_safe_split(
    documents: DataFrame,
    *,
    test_fraction: float = 0.1,
    threshold: float = 0.8,
    buckets: int = 10_000,
    pair_source: str = "lsh",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test assignment that cannot leak near-duplicates across
    the boundary: documents are clustered first
    (:func:`~etl_gcp_spark.operators.graph.dedup_clusters`), then the
    WHOLE cluster is assigned by the deterministic Lehmer hash of its
    cluster id — a doc and its paraphrases always land on the same
    side. A per-document split (train_test_split) silently puts
    near-copies of training text into the test set, the classic
    eval-contamination failure.

    Output: (doc_id, cluster_id, split). Deterministic and
    engine-portable — the same exact-arithmetic hash as
    operators/sampling.py, so an oracle can replay the split.
    """
    from etl_gcp_spark.operators.graph import dedup_clusters
    from etl_gcp_spark.operators.sampling import hash_bucket

    clusters = dedup_clusters(
        documents,
        threshold=threshold,
        pair_source=pair_source,
        text_col=text_col,
        id_col=id_col,
    )
    cut = int(round(test_fraction * buckets))
    return clusters.select(
        F.col(id_col),
        F.col("cluster_id"),
        F.when(
            hash_bucket(F.col("cluster_id"), buckets) < cut, "test"
        )
        .otherwise("train")
        .alias("split"),
    )


def cluster_keeper_dedup(
    documents: DataFrame,
    *,
    threshold: float = 0.8,
    pair_source: str = "lsh",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup removal that keeps the HIGHEST-QUALITY representative
    of each cluster (ties → lowest id) instead of the lowest-id one —
    what a curation run actually wants: when a crawl holds five
    mutated copies, keep the cleanest, not the first-seen.

    Output: one row per cluster — (doc_id, cluster_id,
    quality_score) of the kept document. Composes two verified
    pieces (cluster labels + quality features); the extra cost over
    plain dedup is one narrow join and a per-cluster window.
    """
    from etl_gcp_spark.functions.text import quality_score
    from etl_gcp_spark.operators.graph import dedup_clusters

    docs = (
        documents.withColumnRenamed(id_col, "doc_id")
        if id_col != "doc_id"
        else documents
    )
    clusters = dedup_clusters(
        docs,
        threshold=threshold,
        pair_source=pair_source,
        text_col=text_col,
        id_col="doc_id",
    )
    q = quality_score(docs, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc_nulls_last(), F.col("doc_id")
    )
    return (
        clusters.join(q, "doc_id", "left")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("doc_id").alias(id_col), "cluster_id", "quality_score"
        )
    )


def pack_offsets(
    documents: DataFrame,
    *,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Token-offset layout for :func:`pack_documents`: where each
    document's tokens START inside its pack — what the data loader
    actually needs to slice packed sequences back apart.

    A document joins the pack where its exclusive prefix sum lands
    (the streaming fill rule), so ``start_offset`` < budget always,
    and the LAST document of a pack may run past the budget (packs
    are closed by arrival, not truncation — truncation belongs to the
    tokenizer stage). Output: (doc_id, shard, pack_id, start_offset,
    n_tokens), one shuffle on the shard key.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    cum_excl = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        documents.select(
            F.col(id_col), F.col(shard_col).alias("shard"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("__prefix", cum_excl)
        .select(
            id_col,
            "shard",
            F.floor(F.col("__prefix") / budget).alias("pack_id"),
            (F.col("__prefix") % budget).alias("start_offset"),
            "n_tokens",
        )
    )


def curriculum_buckets(
    documents: DataFrame,
    *,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum bucketing: assign every document a quality DECILE
    (1 = lowest) — the sampling knob for quality-weighted or
    curriculum-ordered training.

    Scale posture: a global ``ntile`` would funnel the corpus through
    ONE partition for a total sort. Instead the n−1 exact decile
    BOUNDARIES are computed as one interpolating-percentile aggregate
    (rounded to 6 dp — the cross-engine determinism contract), then
    broadcast; assignment is a per-row comparison count against the
    tiny boundary array. Ties at a boundary land in the lower bucket
    on both engines. Output: (doc_id, quality_score, bucket).
    """
    from etl_gcp_spark.functions.text import quality_score

    docs = (
        documents.withColumnRenamed(id_col, "doc_id")
        if id_col != "doc_id"
        else documents
    )
    q = quality_score(docs, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bnds = q.agg(
        F.transform(
            F.percentile("quality_score", F.array(*[F.lit(f) for f in fracs])),
            lambda b: F.round(b, 6),
        ).alias("__bnds")
    )
    return (
        q.join(F.broadcast(bnds))
        .select(
            F.col("doc_id").alias(id_col),
            "quality_score",
            (
                F.size(
                    F.filter(
                        F.col("__bnds"),
                        lambda b: F.col("quality_score") > b,
                    )
                )
                + 1
            ).cast("int").alias("bucket"),
        )
    )


def boilerplate_strip(
    documents: DataFrame,
    *,
    min_docs: int = 3,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every sentence that
    ``boilerplate_sentences`` flags (repeated across ≥ ``min_docs``
    docs) and reassemble each document from its surviving sentences in
    original order.  Returns (id, clean_text, n_kept, n_removed).

    Scale shape: the corpus is sentence-exploded ONCE; the flagged
    set is the output of a corpus-wide aggregation and is small by
    construction (only cross-doc repeats survive), so the membership
    probe is a broadcast left join on the sentence text — the big side
    never shuffles.  Reassembly is a groupBy on the document id
    carrying (pos, sentence) structs; order is restored with
    ``array_sort`` on pos, not a window, so there is exactly one
    exchange after the explode.  No reference analog (the reference
    stops at row-level cleaning, data_loader.py:296-384).
    """
    from etl_gcp_spark.caching import tag_pinned

    sent = (
        documents.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias(
                "pos", "__raw"
            ),
        )
        .select(F.col(id_col), "pos", F.trim("__raw").alias("sentence"))
        # pinned: the flagged-set aggregation below and the reassembly
        # join both read the exploded sentences; release with
        # etl_gcp_spark.caching.unpersist_pinned(result)
        .persist()
    )
    # same flagging rule as boilerplate_sentences, derived from the
    # shared exploded frame instead of a second corpus explode
    boiler = (
        sent.filter(F.length("sentence") >= min_len)
        .groupBy("sentence")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("sentence", F.lit(True).alias("__boiler"))
    )
    flagged = sent.join(F.broadcast(boiler), "sentence", "left").select(
        F.col(id_col),
        "pos",
        "sentence",
        F.coalesce("__boiler", F.lit(False)).alias("__drop"),
    )
    packed = F.array_sort(
        F.collect_list(F.struct("pos", "sentence", "__drop"))
    )
    kept = F.filter(packed, lambda s: ~s["__drop"])
    out = flagged.groupBy(id_col).agg(
        F.concat_ws(
            ". ", F.transform(kept, lambda s: s["sentence"])
        ).alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.size(kept)).cast("long").alias("n_removed"),
    )
    return tag_pinned(out, sent)


def dsir_weights(
    documents: DataFrame,
    *,
    target_source: str = "src0",
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public
    methodology): score every NON-target document by the mean
    log-likelihood ratio of its tokens under smoothed unigram models
    of the target domain vs the rest of the corpus —
    ``mean_t log( p_target(t) / p_raw(t) )`` with add-``alpha``
    smoothing over the SHARED vocabulary.  High scores = "looks like
    the target domain"; downstream, ``mixture_sample`` can resample on
    the sigmoid of this weight.

    Scale shape: two corpus-wide token-frequency aggregations (one
    per model) combined with a full-outer join on the token — both
    map-side-combined, shuffling one row per distinct token.  The
    per-document scoring joins the exploded corpus against that
    (small, vocabulary-sized) ratio table; at web scale the vocab
    table still fits executor memory and is broadcast.  Rounding to
    6 dp makes the score hash-stable for the oracle.  Output:
    (id, n_tokens, dsir_logweight), non-target docs only.
    """
    toks = documents.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(tokens(F.col(text_col))).alias("tok"),
        # pinned: both frequency models and the final scoring pass read
        # the exploded tokens; release with
        # etl_gcp_spark.caching.unpersist_pinned(result)
    ).persist()
    tgt = (
        toks.filter(F.col(source_col) == target_source)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    raw = (
        toks.filter(F.col(source_col) != target_source)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_r"))
    )
    vocab = tgt.join(raw, "tok", "full_outer").select(
        "tok",
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
        F.coalesce("c_r", F.lit(0)).alias("c_r"),
    )
    totals = vocab.agg(
        F.sum("c_t").alias("__tt"),
        F.sum("c_r").alias("__tr"),
        F.count(F.lit(1)).alias("__v"),
    )
    ratio = vocab.join(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("c_t") + alpha) / (F.col("__tt") + alpha * F.col("__v")))
            - F.log((F.col("c_r") + alpha) / (F.col("__tr") + alpha * F.col("__v")))
        ).alias("__llr"),
    )
    from etl_gcp_spark.caching import tag_pinned

    out = (
        toks.filter(F.col(source_col) != target_source)
        .join(F.broadcast(ratio), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("__llr"), 6).alias("dsir_logweight"),
        )
    )
    return tag_pinned(out, toks)


def source_overlap_matrix(
    documents: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise cross-SOURCE contamination matrix: for every ordered
    source pair (a < b) sharing at least one distinct n-gram, the
    shared-shingle count and the shingle-set Jaccard.  The corpus
    curator's view of which shards overlap (mirror sites, syndicated
    feeds, scrape-twice accidents) BEFORE any doc-level dedup runs.

    Scale shape: shingles dedup to (source, gram-hash) pairs first —
    the self-join then runs over per-gram source lists, and since the
    number of SOURCES is small (hundreds at web scale, vs billions of
    docs), the per-gram fanout is bounded by sources-per-gram, not
    docs-per-gram.  Exchanges carry the 8-byte gram hash, never gram
    text (same collision posture as ``dup_count``).
    """
    from etl_gcp_spark.caching import tag_pinned

    grams = (
        with_shingles(documents, text_col, id_col, n)
        .join(
            documents.select(F.col(id_col), F.col(source_col)), id_col
        )
        .select(
            # explode_outer: same interpreted-transform re-evaluation
            # trap as ngram_jaccard_pairs / dup_ngram_fraction
            F.col(source_col).alias("src"),
            F.explode_outer("shingles").alias("__g"),
        )
        .select("src", F.xxhash64("__g").alias("__h"))
        .dropDuplicates()
        # pinned: three subtrees (both self-join sides + sizes) would
        # otherwise re-run the corpus explode; release with
        # etl_gcp_spark.caching.unpersist_pinned(result)
        .persist()
    )
    sizes = grams.groupBy("src").agg(F.count(F.lit(1)).alias("__sz"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.__h") == F.col("b.__h"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("src", "src_a")), "src_a"
        )
        .withColumnRenamed("__sz", "__sa")
        .join(
            F.broadcast(sizes.withColumnRenamed("src", "src_b")), "src_b"
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("__sa") + F.col("__sz") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
    return tag_pinned(out, grams)


def contamination_bloom(
    documents: DataFrame,
    *,
    benchmark_source: str = "src0",
    min_shared: int = 3,
    n: int = 3,
    m_bits: int = 1 << 20,
    n_hashes: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """:func:`contamination_overlap` with a BLOOM-FILTER prefilter —
    the 100 TB decontamination posture.

    The exact screen broadcasts the full benchmark shingle-hash set
    into a join; at web-corpus scale that set is GBs and every corpus
    shingle rides the join. Here the benchmark set is first folded
    into an ``m_bits`` bloom bitset built WITH DATAFRAME AGGREGATES
    (no driver collect, no private Spark APIs — ``bloom_filter_agg``
    is not a public routine in this build):

      bit positions  = pmod(xxhash64(h, j), m)  for j < n_hashes
      64-bit words   = explode → groupBy(word) → bit_or(mask)
      bitset         = map_from_entries(sorted (word, bits) pairs)

    The sparse word-map (≤ m/64 entries ≈ 128 KB at m=2^20) broadcasts
    to every task and each corpus shingle probes it with two
    ``element_at`` + bitwiseAND expressions inside whole-stage codegen
    — survivors only then enter the exact broadcast verify join, so
    the RESULT IS EXACT (blooms have no false negatives; false
    positives are removed by the verify join) while the join input
    shrinks by the bloom's rejection rate. Same logical output as
    :func:`contamination_overlap`; physical plan trades a GB-scale
    broadcast for a KB-scale one probed map-side.

    Reference has no decontamination analog (its dedup stops at
    full-row duplicates, `data_loader.py:296-311`); this follows the
    open-sourced benchmark-decontamination methodology (n-gram overlap
    screens described in public LLM reports).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    sh = with_shingles(documents, text_col, id_col, n)
    ids = documents.select(F.col(id_col), F.col(source_col))
    posting = (
        sh.join(ids, id_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.explode_outer("shingles").alias("shingle"),
        )
        .select(
            F.col(id_col),
            F.col(source_col),
            F.xxhash64("shingle").alias("__h"),
        )
    )
    bench = (
        posting.filter(F.col(source_col) == benchmark_source)
        .select("__h")
        .dropDuplicates()
    )

    def _bitpos(j: int) -> F.Column:
        return F.pmod(F.xxhash64(F.col("__h"), F.lit(j)), F.lit(m_bits))

    words = (
        bench.select(
            F.explode(F.array(*[_bitpos(j) for j in range(n_hashes)])).alias(
                "__p"
            )
        )
        .select(
            (F.col("__p") / 64).cast("long").alias("__w"),
            # shiftleft's bit count must be a Column-free literal in the
            # Python API — the SQL form takes an expression
            F.expr("shiftleft(1L, cast(__p % 64 AS int))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    bloom = words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__w", "__bits")))
        ).alias("__bf")
    )

    corpus = posting.filter(F.col(source_col) != benchmark_source)
    probe = corpus.crossJoin(F.broadcast(bloom))
    hit = None
    for j in range(n_hashes):
        p = f"pmod(xxhash64(__h, {j}), {m_bits}L)"
        bit = F.expr(
            f"coalesce(element_at(__bf, cast(({p}) / 64 AS long)), 0L)"
            f" & shiftleft(1L, cast(({p}) % 64 AS int)) != 0"
        )
        hit = bit if hit is None else (hit & bit)
    candidates = probe.filter(hit).drop("__bf")

    return (
        candidates.join(F.broadcast(bench), "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def per_source_cap(
    documents: DataFrame,
    *,
    cap: int = 20,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain/source caps: keep at most ``cap`` documents per source
    — the C4/web-corpus guard against a single domain dominating the
    mixture (public methodology: Raffel et al. 2020 cap pages per
    domain; Gopher/MassiveText cap by subdomain). Deterministic
    keeper: the ``cap`` smallest ids per source.

    One ranked window partitioned BY SOURCE — parallel across
    sources, sort-bounded within one. At web scale a handful of mega
    domains make those partitions the stragglers; the standard remedy
    once a domain exceeds executor memory is a two-phase cap (salted
    partial rank, then re-rank the ≤ salt·cap survivors), which this
    op's output contract (exact smallest-``cap`` ids) keeps honest.
    Output: (doc_id, source) of survivors.
    """
    w = Window.partitionBy(source_col).orderBy(F.col(id_col))
    return (
        documents.select(F.col(id_col), F.col(source_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


# power-of-two sequence-length buckets: fixed literal edges so neither
# engine computes log2 (not correctly rounded in libm)
SEQ_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def seq_length_histogram(
    documents: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length distribution over power-of-two buckets, with
    the padding waste each bucket would incur if its docs were padded
    to the bucket edge — the audit that drives packing/padding
    configuration (choose max_seq_len and decide pad-vs-pack by
    looking at exactly this table; :func:`pack_documents` is the
    remedy, this is the diagnosis).

    bucket(n) = smallest edge ≥ n (top edge catches the tail). One
    map-side-combined aggregation over a when-chain bucket id — no
    shuffle wider than the ≤9-row result.

    Output per bucket: (bucket, n_docs, total_tokens, pad_waste,
    waste_share 6 dp) where pad_waste = bucket·n_docs − total_tokens.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    bucket = F.lit(SEQ_BUCKETS[-1])
    for edge in reversed(SEQ_BUCKETS):
        bucket = F.when(n_tok <= edge, edge).otherwise(bucket)
    grouped = (
        documents.select(
            bucket.cast("bigint").alias("bucket"),
            n_tok.cast("bigint").alias("__n"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
        )
    )
    waste = F.col("bucket") * F.col("n_docs") - F.col("total_tokens")
    return grouped.select(
        "bucket",
        "n_docs",
        "total_tokens",
        waste.alias("pad_waste"),
        F.round(
            waste / (F.col("bucket") * F.col("n_docs")).cast("double"), 6
        ).alias("waste_share"),
    ).orderBy("bucket")


def source_quality_report(
    documents: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """The per-source DATASET CARD row: size, token mass, mean
    quality, language diversity, and exact-duplicate share — the
    one-table summary a mixture decision actually reads (which
    sources to up/down-weight, which need dedup first, which are
    single-language). Composes the verified per-doc signals
    (:func:`~etl_gcp_spark.functions.text.quality_score`, md5
    fingerprints) into one grouped pass.

    Mean quality sums the 4-dp scores as DECIMAL(18,4) — exact and
    order-free, so the report is partitioning-invariant and
    oracle-replayable (float means are neither). Everything reduces
    map-side to |sources| rows.

    Output: (source, n_docs, total_tokens, mean_quality, n_langs,
    dup_share).
    """
    from etl_gcp_spark.functions.text import quality_score

    q = quality_score(documents, text_col=text_col).select(
        "doc_id", "n_tokens", "quality_score"
    )
    base = documents.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("__fp"),
    )
    per = (
        base.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(
                F.col("quality_score").cast("decimal(18,4)")
            ).alias("__qs"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("__fp").alias("__nd"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("__qs").cast("double") / F.col("n_docs").cast("double"),
            4,
        ).alias("mean_quality"),
        "n_langs",
        F.round(
            (F.col("n_docs") - F.col("__nd"))
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_share"),
    ).orderBy("source")


def quality_quota_filter(
    documents: DataFrame,
    *,
    keep_fraction: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``keep_fraction`` of each source BY QUALITY —
    quota curation, the relative alternative to quality_filter's
    absolute thresholds: absolute cutoffs collapse entire weak
    sources (starving the mixture) and wave through everything from
    strong ones; a per-source quota preserves source diversity while
    still biasing toward quality within each (the reasoning behind
    per-domain quality buckets in public curation recipes).

    One ranked window per source (quality desc, id tiebreak) against
    a broadcast per-source count; quota = ceil(fraction · n) so a
    1-doc source always survives. Output: (doc_id, source,
    quality_score) of survivors.
    """
    from etl_gcp_spark.functions.text import quality_score

    q = quality_score(documents, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    base = documents.select("doc_id", "source").join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(counts), "source")
        .filter(
            F.col("__rn")
            <= F.ceil(F.col("__n") * F.lit(keep_fraction))
        )
        .select("doc_id", "source", "quality_score")
    )


def benchmark_coverage(
    documents: DataFrame,
    *,
    benchmark_source: str = "src0",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The REVERSE of the contamination screen: per benchmark
    document, what fraction of its distinct n-grams appears anywhere
    in the training corpus. Contamination asks "did eval text leak
    into training?"; coverage asks "does training text even span the
    eval domain?" — near-zero coverage predicts out-of-domain eval
    collapse, near-one (without contamination flags) says the domain
    is represented without leakage. Same join shape with the sides
    swapped: the CORPUS shingle set is the big one now, so it stays
    a shuffle join on the 8-byte hash (never broadcast), and the
    per-benchmark-doc fraction reduces map-side.

    Output: (doc_id, n_shingles, n_covered, coverage 6 dp) for every
    benchmark doc with ≥ n tokens.
    """
    sh = with_shingles(documents, text_col, id_col, n)
    ids = documents.select(F.col(id_col), F.col(source_col))
    posting = (
        sh.join(ids, id_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.explode_outer("shingles").alias("shingle"),
        )
        .select(
            F.col(id_col),
            F.col(source_col),
            F.xxhash64("shingle").alias("__h"),
        )
    )
    corpus = (
        posting.filter(F.col(source_col) != benchmark_source)
        .select("__h")
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    bench = posting.filter(F.col(source_col) == benchmark_source)
    return (
        bench.join(corpus, "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_covered"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_covered",
            F.round(
                F.col("n_covered") / F.col("n_shingles").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def quality_percentile_by_source(
    documents: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Quality scores CALIBRATED within each source: percent_rank of
    the heuristic score per source — raw scores are not comparable
    across sources (a clean-wiki shard's worst doc can outscore a
    web shard's best), so a single global threshold silently keeps
    everything from easy sources and nothing from hard ones.
    Rank-within-source is the calibration that makes one number mean
    the same thing everywhere; pair with ``quality_quota_filter``
    (which cuts on exactly this rank).

    One ranked window per source over the (doc, score) projection;
    percent_rank = (rank−1)/(n−1) is exact rational per group,
    rounded 6 dp, ties sharing a rank (deterministic id tiebreak on
    output order only). Output: (doc_id, source, quality_score,
    quality_pctile).
    """
    from etl_gcp_spark.functions.text import quality_score

    q = quality_score(documents, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    base = documents.select("doc_id", "source").join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(F.col("quality_score"))
    return base.select(
        "doc_id",
        "source",
        "quality_score",
        F.round(F.percent_rank().over(w), 6).alias("quality_pctile"),
    )


def temperature_mixture_weights(
    documents: DataFrame,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-sampled source mixture at α = 0.5: sampling
    probability p_i ∝ (n_i/N)^α — the multilingual/multi-source
    rebalancing rule of XLM-R and mT5 (upsample small sources,
    damp dominant ones) sitting between
    :func:`source_mixture_rates`' uniform target (α→0) and natural
    sampling (α=1).

    α is FIXED at 0.5 because (n_i/N)^0.5 is ``sqrt`` — an
    IEEE-754 correctly-rounded operation on every engine — so the
    whole computation (one division, one sqrt, one sum over the
    per-source frame, one final division) replays bit-for-bit in a
    SQL oracle; a general-α ``pow`` is libm-dependent in its last
    ULP. The α=0.5 point is also mT5's published default.

    Same physical shape as the other mixture ops: one map-side
    count per source, broadcast total, no second corpus scan.
    Output: (source, n_docs, nat_share, weight, expected_per_1000 —
    the per-mille draw allocation, integer-rounded half-up).
    """
    counts = documents.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(F.sum("n_docs").alias("__total"))
    shared = counts.join(F.broadcast(totals)).withColumn(
        "__w", F.sqrt(F.col("n_docs") / F.col("__total"))
    )
    z = shared.agg(F.sum("__w").alias("__z"))
    return (
        shared.join(F.broadcast(z))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("__total"), 6).alias(
                "nat_share"
            ),
            F.round(F.col("__w") / F.col("__z"), 6).alias("weight"),
            F.round(F.col("__w") / F.col("__z") * 1000.0, 0)
            .cast("long")
            .alias("expected_per_1000"),
        )
    )
