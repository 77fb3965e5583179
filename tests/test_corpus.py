"""pii_redact, pack_documents, contamination_overlap contracts."""

from __future__ import annotations

from etl_gcp_spark.functions.text import pii_redact
from etl_gcp_spark.operators.corpus import contamination_overlap, pack_documents
from etl_gcp_spark.sources.readers import load_table


def test_pii_redact_masks_all_classes(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob@example.com and carol@sub.example.org end"),
            (2, "server 10.0.0.1 and 192.168.100.200 up"),
            (3, "acct 1234567890 pin 12345 ok"),
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["redacted"] == "mail [EMAIL] and [EMAIL] end"
    assert out[1]["n_emails"] == 2
    assert out[2]["redacted"] == "server [IP] and [IP] up"
    assert out[2]["n_ips"] == 2
    # 5-digit pin stays (threshold is 6+), 10-digit account masked
    assert out[3]["redacted"] == "acct [NUM] pin 12345 ok"
    assert out[4]["redacted"] == "clean text only"


def test_pack_documents_budget_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 512
    rows = pack_documents(docs, budget=budget).collect()
    packs = {}
    for r in rows:
        packs.setdefault((r["source"], r["pack_id"]), []).append(r)
    for (_, pid), members in packs.items():
        assert pid >= 0
        # a pack only exceeds the budget via its final (boundary) doc:
        # the sum EXCLUDING the last doc (by id) must be under budget
        members.sort(key=lambda r: r["doc_id"])
        assert sum(m["n_tokens"] for m in members[:-1]) < budget
    # per-source pack ids are dense from 0
    by_source = {}
    for (src, pid), _ in packs.items():
        by_source.setdefault(src, set()).add(pid)
    for pids in by_source.values():
        assert pids == set(range(len(pids)))


def test_contamination_flags_verbatim_copy(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, bench_text, "bench"),
            (2, bench_text, "corpus"),          # verbatim copy
            (3, "one two three four five six seven", "corpus"),  # disjoint
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_overlap(
            docs, benchmark_source="bench", min_shared=5
        ).collect()
    }
    assert out == {2: 8}  # 10 tokens -> 8 trigrams, all shared


def test_rolling_weekly_spend_trailing_frame(spark):
    from etl_gcp_spark.operators.relational import rolling_weekly_spend

    orders = spark.createDataFrame(
        [
            (1, 10, "2024-01-01", 100.0),
            (2, 10, "2024-01-05", 50.0),   # within 7d of #1
            (3, 10, "2024-01-20", 25.0),   # outside
            (4, 11, "2024-01-05", 10.0),   # other customer
        ],
        "o_orderkey long, o_custkey long, d string, o_totalprice double",
    ).selectExpr(
        "o_orderkey", "o_custkey",
        "cast(d as timestamp) as o_orderdate", "o_totalprice",
    )
    out = {r["o_orderkey"]: r["spend_7d"] for r in rolling_weekly_spend(orders).collect()}
    assert out == {1: 100.0, 2: 150.0, 3: 25.0, 4: 10.0}


def test_gap_fill_hourly_fills_and_carries_state(spark):
    from etl_gcp_spark.operators.events import gap_fill_hourly

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 7, "signup", 1.0, "{}"),
            (2, "2024-01-01 03:20:00", 7, "click", 1.0, "{}"),
        ],
        "event_id long, t string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(t as timestamp) as ts",
        "user_id", "event_type", "value", "props",
    )
    rows = sorted(gap_fill_hourly(events).collect(), key=lambda r: r["hour"])
    assert len(rows) == 4  # hours 00..03 inclusive
    assert [r["n_events"] for r in rows] == [1, 0, 0, 1]
    # state carries forward through the empty hours
    assert [r["state_type"] for r in rows] == ["signup", "signup", "signup", "click"]


def test_quality_filter_reasons(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import quality_filter

    good = "the quick brown fox jumps over a lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text="tiny doc"),                     # too_short
            Row(doc_id=3, text="a " * 40),                      # repetitive_word
            Row(doc_id=4, text="!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),
            Row(doc_id=5, text=None),                           # null_text
            Row(doc_id=6, text="x y " * 20),                    # mean_token_len < 2
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.keep, r.reason)
        for r in quality_filter(docs, min_tokens=5).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")
    assert got[3][1] in ("repetitive_word", "mean_token_len")
    assert got[4] == (False, "junk")
    assert got[5] == (False, "null_text")
    assert got[6] == (False, "mean_token_len")
    assert len(got) == 6  # every input doc gets a verdict row


def test_curation_funnel_monotone_and_dedups(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import curation_funnel

    import itertools

    letters = [
        "tok" + a + b
        for a, b in itertools.product("abcdefg", repeat=2)
    ]
    base = " ".join(letters[:40])
    near = " ".join(letters[:36] + ["xa", "xb", "xc", "xd"])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),        # exact dup of 1
            Row(doc_id=3, text=near),        # near dup of 1 (J ≈ 0.8)
            Row(doc_id=4, text="short"),     # quality-dropped
            Row(
                doc_id=5,
                text=" ".join(
                    "tok" + a + b
                    for a, b in itertools.product("hijklm", repeat=2)
                ),
            ),
        ],
        "doc_id int, text string",
    )
    rows = {
        r.stage: r.n_docs
        for r in curation_funnel(docs, min_tokens=5).collect()
    }
    assert rows["raw"] == 5
    assert rows["quality_kept"] == 4          # doc 4 gone
    assert rows["exact_deduped"] == 3         # doc 2 gone
    assert rows["near_deduped"] == 2          # doc 3 gone


def test_boilerplate_sentences_finds_repeated_banner(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import boilerplate_sentences

    banner = "this content is provided under the creative commons license"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique alpha words here. {banner}"),
            Row(doc_id=2, text=f"different beta content now. {banner}"),
            Row(doc_id=3, text=f"{banner}. totally gamma material"),
            Row(doc_id=4, text="no shared banner in this one at all"),
        ]
    )
    out = boilerplate_sentences(docs, min_docs=3, min_len=20).collect()
    assert len(out) == 1
    assert out[0].sentence == banner
    assert out[0].n_docs == 3


def test_source_mixture_rates_reweights_to_uniform(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import source_mixture_rates

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="big" if i < 90 else "small", text="x")
         for i in range(100)]
    )
    rates = {r.source: (r.n_docs, r.sample_rate) for r in
             source_mixture_rates(docs).collect()}
    # target = 100/2 = 50 per source: big downsampled, small capped at 1
    assert rates["big"] == (90, round(50 / 90, 6))
    assert rates["small"] == (10, 1.0)


def test_mixture_sample_rebalances_and_is_deterministic(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from etl_gcp_spark.operators.corpus import mixture_sample

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, source="big" if i < 900 else "small", text="x")
            for i in range(1000)
        ]
    )
    out = mixture_sample(docs)  # budget 1.0: uniform remix target
    counts = {
        r.source: r.n_kept
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .collect()
    }
    # big (900 docs, rate 500/900) downsamples toward 500; small
    # (100 docs, rate capped at 1.0) keeps everything
    assert counts["small"] == 100
    assert 400 <= counts["big"] <= 600
    # deterministic: same survivors on a second run
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in mixture_sample(docs).collect())
    assert ids1 == ids2


def test_quality_filter_custom_id_col(spark):
    # regression: repetition_signals hardcodes doc_id, so a
    # non-default id_col raised inside quality_filter before the
    # rename ever applied
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import quality_filter

    good = "the quick brown fox jumps over a lazy dog near the river bank"
    docs = spark.createDataFrame(
        [Row(my_id=1, text=good), Row(my_id=2, text="tiny doc")],
        "my_id int, text string",
    )
    out = quality_filter(docs, min_tokens=5, id_col="my_id")
    assert out.columns == ["my_id", "keep", "reason"]
    got = {r.my_id: (r.keep, r.reason) for r in out.collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")


def test_leakage_safe_split_keeps_clusters_together(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import leakage_safe_split

    base = "the quick brown fox jumps over a lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),                      # near-dup of 1
            Row(doc_id=3, text=base + " extra token"),     # near-dup of 1
            Row(doc_id=4, text="completely different words about spark"),
        ],
        "doc_id int, text string",
    )
    out = leakage_safe_split(
        docs, test_fraction=0.5, threshold=0.8, pair_source="exact"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 4
    # the whole near-dup cluster shares one cluster id and one split
    assert rows[1].cluster_id == rows[2].cluster_id == rows[3].cluster_id
    assert rows[1].split == rows[2].split == rows[3].split
    # determinism: re-running produces the identical assignment
    again = {r.doc_id: r.split for r in leakage_safe_split(
        docs, test_fraction=0.5, threshold=0.8, pair_source="exact"
    ).collect()}
    assert again == {k: v.split for k, v in rows.items()}


def test_cluster_keeper_picks_highest_quality(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.functions.text import quality_score
    from etl_gcp_spark.operators.corpus import cluster_keeper_dedup

    clean = "the quick brown fox jumps over a lazy dog near the river bank"
    junky = clean + " !!! ### $$$"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=junky),   # lower quality, LOWER id
            Row(doc_id=2, text=clean),   # higher quality
            Row(doc_id=3, text="unrelated single doc standing alone here"),
        ],
        "doc_id int, text string",
    )
    # pair_source="exact": the unit test pins keeper SELECTION; LSH
    # recall at low thresholds is covered by its own tests/oracle
    out = {r.cluster_id: r for r in cluster_keeper_dedup(
        docs, threshold=0.5, pair_source="exact").collect()}
    q = {r.doc_id: r.quality_score for r in quality_score(docs).collect()}
    assert q[2] > q[1]
    # cluster {1,2}: keeper is doc 2 (higher quality), NOT min-id 1
    cluster_of_12 = [c for c, r in out.items() if r.doc_id in (1, 2)]
    assert len(cluster_of_12) == 1
    assert out[cluster_of_12[0]].doc_id == 2
    # singleton keeps itself
    assert any(r.doc_id == 3 for r in out.values())


def test_pack_offsets_layout_invariants(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import pack_offsets

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, source="s", text=" ".join(["w"] * n))
            for i, n in enumerate([5, 4, 3, 6, 2])
        ],
        "doc_id int, source string, text string",
    )
    rows = sorted(
        pack_offsets(docs, budget=8).collect(), key=lambda r: r.doc_id
    )
    # fill rule: 5 | 4,3 would overflow -> doc1 starts pack0 offset 5
    # (packs close by arrival: last doc may run past the budget)
    assert [(r.pack_id, r.start_offset) for r in rows] == [
        (0, 0), (0, 5), (1, 1), (1, 4), (2, 2),
    ]
    # start_offset is always inside the budget
    assert all(0 <= r.start_offset < 8 for r in rows)


def test_curriculum_buckets_monotone_in_quality(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.corpus import curriculum_buckets

    clean = "the quick brown fox jumps over a lazy dog by the river"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=clean),
            Row(doc_id=2, text=clean + " !!!"),
            Row(doc_id=3, text=clean + " !!! ### $$$"),
            Row(doc_id=4, text=clean + " !!! ### $$$ %%% ^^^"),
        ],
        "doc_id int, text string",
    )
    out = sorted(
        curriculum_buckets(docs, n_buckets=4).collect(),
        key=lambda r: r.doc_id,
    )
    # bucket ordering follows quality ordering (1 = lowest quality)
    by_quality = sorted(out, key=lambda r: r.quality_score)
    assert [r.bucket for r in by_quality] == sorted(
        r.bucket for r in out
    )
    assert out[0].bucket == max(r.bucket for r in out)   # cleanest doc
    assert 1 <= min(r.bucket for r in out)


def test_decontaminate_docs_actions_spans_and_threshold(spark):
    """The ACT edge over the contamination screens: colliding 3-gram
    windows are excised token-by-token (overlapping windows merge —
    tokens counted once), the rewrite preserves surviving order,
    clean docs pass byte-identical, sub-n docs have no windows, and
    a mostly-benchmark doc crosses the strict 0.3 fraction and is
    dropped with NULL text."""
    from etl_gcp_spark.operators.corpus import decontaminate_docs

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "src0"),  # the benchmark
            (1, "one two three four five", "src1"),
            (2, "x y alpha beta gamma z w q r t", "src1"),
            # overlapping collisions: windows [0] and [1] both hit ->
            # removed {0,1,2} ∪ {1,2,3} = 4 of 12 tokens = 0.33 > 0.3
            (3, "alpha beta gamma delta p q r s t u v w", "src1"),
            (4, "hi there", "src1"),  # shorter than n: no windows
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_docs(
            docs, benchmark_source="src0", n=3, max_removed_frac=0.3
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # benchmark shard excluded
    assert out[1]["action"] == "keep"
    assert out[1]["clean_text"] == "one two three four five"
    assert out[1]["n_removed"] == 0
    assert out[2]["action"] == "rewrite"
    assert out[2]["n_removed"] == 3
    assert out[2]["clean_text"] == "x y z w q r t"
    assert out[3]["action"] == "drop"
    assert out[3]["n_removed"] == 4  # merged union, not 2 windows * 3
    assert out[3]["clean_text"] is None
    assert out[4]["action"] == "keep"
    assert out[4]["clean_text"] == "hi there"
