"""Accuracy contract for the demoted DataSketches registry entry.

``hll_distinct_stats`` left ``queries()`` in round 5 (its serialized
DataSketches estimators are engine-specific, so the driver could only
ever run a weak rows-only check; ``hll_replayable`` — same table, key
and grouping, register-replayed — is the canonical value-hash entry).
The operator itself stays supported: this test pins its entry shape
and its estimate accuracy against exact answers on the real testdata.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def test_hll_distinct_stats_shape_and_accuracy(spark, sf_dir):
    df = entrymod._q_hll_distinct_stats(spark, sf_dir)
    assert df.columns == [
        "o_orderpriority",
        "est_distinct_custs",
        "approx_median_price",
    ]
    got = {r["o_orderpriority"]: r for r in df.collect()}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for prio, row in got.items():
        nd, med = exact[prio]["nd"], exact[prio]["med"]
        # HLL (lgK=12 default) is ~1.6% RSE; allow 5% plus slack for
        # the tiny-group regime at sf0.001
        assert abs(row["est_distinct_custs"] - nd) <= max(0.05 * nd, 3.0)
        # GK approx_percentile with default accuracy is exact-rank on
        # groups this small, but keep a relative tolerance for scale
        assert abs(row["approx_median_price"] - med) <= 0.05 * med

    # not a registry entry anymore, and the canonical twin is
    assert "hll_distinct_stats" not in entrymod.queries()
    assert "hll_replayable" in entrymod.oracle_sql()
