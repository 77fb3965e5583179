"""Shared fixtures: one SparkSession for the whole test run.

Mirrors the reference's test posture (unit tests per operator,
tests/test_*.py in /root/reference) but swaps mocks for a real local
SparkSession — operator semantics are what we test, not I/O clients.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (
        # local[8] (was local[4]): halves the compute-bound test tail
        # (kcore invariants + leakage-split pair: 82 s -> 41 s) toward
        # the <15 min driver-suite target (VERDICT r10 item 3).
        # shuffle.partitions stays 4 — tests that count output files
        # or reason about post-shuffle layout keep their semantics;
        # only task parallelism (and defaultParallelism-derived write
        # clustering caps) widens.
        SparkSession.builder.master("local[8]")
        .appName("etl_gcp_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
