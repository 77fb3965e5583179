"""Small driver-side tables through the Arrow path.

``spark.createDataFrame(list_of_tuples, schema)`` builds a
parallelize-backed frame: the rows are pickled into
``spark.default.parallelism`` RDD slices, and every downstream task
pays one Python-worker round trip per parent slice it reads. The
worst case is the ``coalesce(1).write`` shape every index artifact
uses for its tiny metadata tables — one task draining 32 pickled
slices sequentially (measured 4.7 s to write a 32-row centroid
table at local[32]). The same table shipped as ONE Arrow batch via a
pandas frame writes in 0.2 s, and the cost scales with cluster
default parallelism, not table size, so the gap only widens on a
real cluster.

``small_df`` routes list-of-tuples construction through pandas +
Arrow with the same explicit schema (values are unchanged: ints,
floats and float arrays round-trip bit-exactly through Arrow).
Callers keep their DDL schema string; empty inputs fall back to the
classic path, which is cheap at zero rows and avoids empty-pandas
Arrow edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def small_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small driver-side
    lists of plain tuples (ints / floats / strings / numeric arrays),
    shipped as one Arrow batch instead of pickled RDD slices."""
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = [f.split()[0] for f in _split_top_level(schema)]
    pdf = pd.DataFrame(
        {n: [r[i] for r in rows] for i, n in enumerate(names)},
        columns=names,
    )
    return spark.createDataFrame(pdf, schema=schema)


def _split_top_level(schema: str) -> list[str]:
    """Split a DDL struct string on top-level commas only —
    ``"cell int, centroid array<double>"`` → two fields, the
    ``array<double>`` comma-free because ``<...>`` nests no commas at
    depth 0."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur).strip())
    return fields
