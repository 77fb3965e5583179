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
