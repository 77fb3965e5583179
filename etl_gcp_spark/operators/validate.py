"""Rule-based validation engine (reference parity, SURVEY.md §2.2/2.4).

The reference hard-codes three checks in ``validate_data``
(data_loader.py:339-388): a theta filter (``yearstart > yearend``), a
range predicate (``datavalue < 0 OR datavalue > 100``), and per-column
null counts, then exports the union of violation rows
(``pd.concat(...).drop_duplicates()``, data_loader.py:379-384). Here
that becomes a declarative rule engine: a rule is ``(name, violation
predicate)``; the engine emits (a) the deduplicated violation rows,
(b) a per-rule summary — both as DataFrames so they compose and the
counts run as ONE aggregation pass over the data instead of one scan
per rule.

Note the reference computes these per 10K-row chunk (it cannot see
cross-chunk duplicates, SURVEY.md §3.2); this engine is global —
an intentional correctness upgrade.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named violation predicate: rows matching ``condition`` are bad."""

    name: str
    condition: Column


def violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """P14: deduplicated union of all violating rows.

    Single filter on the OR of all predicates + ``dropDuplicates`` —
    one scan, one shuffle, regardless of rule count (the reference
    concatenates per-rule frames, scanning once per rule).
    """
    if not rules:
        return df.limit(0)
    combined = reduce(lambda a, b: a | b, [r.condition for r in rules])
    return df.filter(combined).dropDuplicates()


def violation_summary(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Per-rule violation counts as (rule, violations) rows.

    All rules are counted in ONE aggregation pass via conditional
    sums (the reference's A3/A7 pattern, data_validator.py:94-96),
    then unpivoted driver-side (rule count is tiny, data is not).
    """
    agg_row = df.agg(
        *[
            F.sum(F.when(r.condition, 1).otherwise(0))
            .cast("long")
            .alias(r.name)
            for r in rules
        ]
    )
    stack_expr = ", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    return agg_row.selectExpr(
        f"stack({len(rules)}, {stack_expr}) as (rule, violations)"
    )


def null_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """A7: one-row frame of null counts for each critical column
    (reference data_loader.py:361-366) — single pass."""
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
            for c in cols
        ]
    )


def range_rule(col: str, lo: float, hi: float) -> Rule:
    """P12 analog: value outside [lo, hi] is a violation
    (reference data_loader.py:356-359)."""
    return Rule(
        f"{col}_out_of_range",
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)),
    )


def order_rule(low_col: str, high_col: str) -> Rule:
    """P11 analog: logical-consistency theta predicate
    (reference data_loader.py:350-353, yearstart > yearend)."""
    return Rule(f"{low_col}_gt_{high_col}", F.col(low_col) > F.col(high_col))


def not_null_rule(col: str) -> Rule:
    """P13 analog: NULL in a critical column is a violation."""
    return Rule(f"{col}_null", F.col(col).isNull())
