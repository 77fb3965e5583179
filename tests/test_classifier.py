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
