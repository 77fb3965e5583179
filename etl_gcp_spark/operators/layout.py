"""Space-filling-curve data layout: Z-order (Morton) clustering.

At 100 TB, scan cost is dominated by how much data a query can SKIP.
Partition pruning handles one dimension; multi-dimensional predicates
(custkey range AND price band) need the file layout itself to be
multi-dimensionally clustered, so per-file min/max statistics become
selective on EVERY curve dimension at once — the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea, built here from first principles on
plain DataFrame ops.  No reference analog (the reference writes
whatever row order pandas happens to hold, data_loader.py:366-384).

The curve key is pure integer Column arithmetic (rank-normalize each
dimension to ``bits`` bits, interleave bitwise) — JVM codegen, no
UDF, one broadcast of the 1-row min/max frame; the write path is a
``repartitionByRange`` on the key so each output file owns one tight
Z-range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """Append a Morton Z-order key interleaving ``cols``.

    Each column is min/max-normalized to ``[0, 2^bits)`` (degenerate
    constant columns map to 0), then the keys' bits are interleaved
    LSB-first: bit ``b`` of dimension ``i`` lands at curve position
    ``b * len(cols) + i``.  All arithmetic is integer shift/mask on
    longs — whole-stage codegen, replayable verbatim in the DuckDB
    oracle.  The min/max frame is a single 1-row aggregate joined
    back by broadcast (no driver round-trip, no second scan at scale
    thanks to parquet column statistics).
    """
    n = len(cols)
    kmax = (1 << bits) - 1
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("double").alias(f"__min_{c}"),
                F.max(c).cast("double").alias(f"__max_{c}"),
            )
        ]
    )

    def scaled(c: str) -> Column:
        rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        frac = (F.col(c).cast("double") - F.col(f"__min_{c}")) / rng
        return F.when(rng == 0, F.lit(0).cast("long")).otherwise(
            F.floor(frac * kmax).cast("long")
        )

    with_scaled = df.join(F.broadcast(stats)).select(
        "*", *[scaled(c).alias(f"__s_{c}") for c in cols]
    )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__s_{c}"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return with_scaled.select(
        *df.columns, z.cast("long").alias(key_name)
    )


def zorder_layout_stats(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket clustering statistics for a Z-order layout over
    ``cols``: bucket = the top ``log2(n_buckets)`` bits of the curve
    key (≙ one output file under ``repartitionByRange``), with row
    count and per-dimension min/max — exactly the footer statistics a
    scan would prune on.  Tight per-bucket ranges on EVERY dimension
    are the point of the curve; compare with a single-column sort,
    where the second dimension's per-file range spans the whole
    domain and nothing prunes.
    """
    shift = bits * len(cols) - (n_buckets - 1).bit_length()
    keyed = zorder_key(df, cols, bits=bits)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        keyed.select(
            F.shiftright(F.col("zkey"), shift).alias("bucket"), *cols
        )
        .groupBy("bucket")
        .agg(*aggs)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 64,
) -> None:
    """Write ``df`` as parquet physically clustered on the Z-curve:
    ``repartitionByRange(n_files, zkey)`` then ``sortWithinPartitions``
    so row groups inside each file are curve-ordered too (page-level
    stats stay selective).  The key column is dropped from the output
    — it is a layout device, not data.
    """
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
