"""Property-based tests (hypothesis) for operator invariants.

The reference declares hypothesis in requirements-test.txt but never
imports it (SURVEY.md §5.3); these are the properties its operators
implicitly promise.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import Row

from etl_gcp_spark.operators.clean import clean, normalize_columns
from etl_gcp_spark.operators.dedup import dedup, dup_count
from etl_gcp_spark.schemas import normalize_name, schema_diff, schema_from_pandas

# ---------------------------------------------------------- pure python

name_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" -._"
    ),
    min_size=1,
    max_size=30,
)


@given(name_strategy)
def test_normalize_name_idempotent(name):
    once = normalize_name(name)
    assert normalize_name(once) == once
    assert " " not in once and "-" not in once and "." not in once
    assert once == once.lower()


@settings(deadline=None)  # first example pays the pandas import
@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8, unique=True))
def test_schema_diff_reflexive(cols):
    import pandas as pd

    pdf = pd.DataFrame({c: [1] for c in cols})
    schema = schema_from_pandas(pdf)
    assert schema_diff(schema, schema).compatible


# ------------------------------------------------------------- spark

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(-100, 100)),
    st.one_of(st.none(), st.text(alphabet="aB c!", max_size=6)),
    st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
)


@_slow
@given(st.lists(row_strategy, min_size=1, max_size=12))
def test_clean_idempotent_and_null_free(spark, rows):
    df = spark.createDataFrame(
        [Row(n=r[0], s=r[1], v=r[2]) for r in rows],
        "n long, s string, v double",
    )
    once = clean(df).collect()
    twice = clean(clean(df)).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))
    for r in once:  # every cleaned column is non-null
        assert r.n is not None and r.s is not None and r.v is not None
        assert r.s == r.s.strip().lower()


@_slow
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)), min_size=1, max_size=20))
def test_dedup_invariants(spark, rows):
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in rows])
    distinct_rows = set(map(tuple, df.collect()))
    deduped = dedup(df)
    assert set(map(tuple, deduped.collect())) == distinct_rows
    assert deduped.count() == len(distinct_rows)
    # dup_count is exactly the surplus
    assert dup_count(df).collect()[0].dup_count == len(rows) - len(distinct_rows)


@_slow
@given(
    st.lists(
        st.text(alphabet="ab .-", min_size=1, max_size=10), min_size=1, max_size=5
    )
)
def test_normalize_columns_idempotent(spark, names):
    # make unique post-normalization to keep a valid schema
    uniq = {}
    for n in names:
        uniq.setdefault(normalize_name(n), n)
    cols = list(uniq.values())
    df = spark.createDataFrame([tuple(range(len(cols)))], cols)
    once = normalize_columns(df)
    assert normalize_columns(once).columns == once.columns
