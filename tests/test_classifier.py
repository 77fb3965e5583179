"""Trainable quality classifier: learning behavior and replay
discipline (the registered entry's exactness is covered by the
oracle; here we prove the model LEARNS on separable data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _separable_docs(spark):
    # label 1 <=> long documents: x1 (n_tokens/100) separates cleanly
    rows = [(i, " ".join(["tok"] * 60), "en") for i in range(20)] + [
        (100 + i, " ".join(["tok"] * 4), "zh") for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_logreg_learns_separable_corpus(spark):
    from etl_gcp_spark.operators.classifier import logreg_quality_report

    row = logreg_quality_report(
        _separable_docs(spark), n_steps=25, lr=2.0
    ).collect()[0]
    assert row.train_acc == 1.0
    # longer docs are the positive class -> positive length weight
    assert row.w_len > 0


def test_logreg_loss_decreases(spark):
    from etl_gcp_spark.operators.classifier import (
        doc_feature_table,
        train_logreg,
    )

    docs = _separable_docs(spark)
    feats = doc_feature_table(
        docs, label=(F.col("lang") == "en").cast("double")
    ).cache()

    def sq_err(w):
        from etl_gcp_spark.operators.classifier import _fast_sigmoid, _z

        p = _fast_sigmoid(_z())
        return (
            feats.crossJoin(F.broadcast(w))
            .agg(F.sum((p - F.col("y")) * (p - F.col("y"))))
            .collect()[0][0]
        )

    first = sq_err(train_logreg(feats, n_steps=1, lr=1.0))
    later = sq_err(train_logreg(feats, n_steps=10, lr=1.0))
    assert later < first
    feats.unpersist()


def test_logreg_partitioning_invariant(spark):
    from etl_gcp_spark.operators.classifier import logreg_quality_report

    docs = _separable_docs(spark)
    a = logreg_quality_report(docs.repartition(1), n_steps=3).collect()
    b = logreg_quality_report(docs.repartition(7), n_steps=3).collect()
    # decimal gradient sums make training independent of partitioning
    assert a == b


def test_calibration_bins_partition_and_consistency(spark):
    """Bins partition the corpus (counts sum to n_docs), probabilities
    and rates stay in [0,1], the gap is |mean_pred - pos_rate|, and —
    like training itself — the report is partitioning-invariant
    (decimal sums + floor binning on bit-identical IEEE probs)."""
    from etl_gcp_spark.operators.classifier import logreg_calibration_bins

    docs = _separable_docs(spark)
    rows = logreg_calibration_bins(docs, n_steps=3).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_pred <= 1.0 and 0.0 <= r.pos_rate <= 1.0
        assert abs(r.abs_gap - round(abs(r.mean_pred - r.pos_rate), 6)) < 1e-9
        # bin membership: mean predicted prob lies inside the bin's
        # [lo, hi) width (up to the 6-dp rounding of mean_pred)
        assert r.bin / 10 - 1e-6 <= r.mean_pred <= (r.bin + 1) / 10 + 1e-6
    b = logreg_calibration_bins(docs.repartition(7), n_steps=3).collect()
    assert rows == b
