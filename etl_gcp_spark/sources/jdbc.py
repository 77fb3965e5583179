"""JDBC source/sink convenience wrappers (reference S6/S8/S9/S10).

The reference's staging store is a relational database read with
psycopg2 (data_extractor.py:379-412) and loaded back with
per-chunk INSERTs (data_loader.py:106-108). The harness substitutes
parquet for the synthetic tables (SURVEY.md §2.1), but users with a
relational store get the same surface through Spark's JDBC source:

- :func:`read_jdbc` — full or PARTITIONED parallel scan. The
  partitioned form (``partition_column`` + bounds) is the
  deterministic replacement for the reference's ORDER-BY-less
  OFFSET/LIMIT pagination (SURVEY.md §2.1-S9): every executor reads
  a disjoint key range instead of racing an unstable cursor, and
  Catalyst pushes filters/projections down into the remote SQL.
- :func:`write_jdbc` — batched parallel INSERT with the reference's
  TRUNCATE-vs-recreate choice (data_extractor.py:314-377) exposed as
  ``truncate=True`` on overwrite.

Scale notes: one JDBC connection per partition on both paths; size
``num_partitions`` to what the database can absorb, and always set
bounds that cover the real key domain (rows outside the bounds are
still read, but by the two edge partitions). ``fetchsize``/
``batchsize`` default to 10 000 — the same order as the reference's
10K-row loader chunks (data_loader.py:65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a relational table (or ``(subquery) alias``) over JDBC.

    With ``partition_column``/bounds/``num_partitions`` the scan is
    split into disjoint ``WHERE col >= x AND col < y`` range queries
    executed in parallel — S9's pagination, made deterministic. The
    column should be indexed and roughly uniform; skewed domains want
    a synthetic hash column instead.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partitioned JDBC read needs partition_column, "
                "lower_bound, upper_bound AND num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 10_000,
    truncate: bool = False,
    num_partitions: int | None = None,
    isolation_level: str | None = None,
    driver: str | None = None,
    **options: str,
) -> None:
    """Write a DataFrame to a relational table over JDBC.

    ``mode='overwrite'`` with ``truncate=True`` issues ``TRUNCATE``
    and keeps the existing DDL (the reference's schema-match fast
    path, data_extractor.py:314-330); ``truncate=False`` drops and
    recreates (the mismatch path). Each partition writes its own
    batched INSERT stream; ``num_partitions`` caps the connection
    count via ``coalesce`` (no shuffle).
    """
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true" if truncate else "false")
    )
    if isolation_level:
        writer = writer.option("isolationLevel", isolation_level)
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(name: str) -> str:
    """JDBC URL for an in-memory Apache Derby database.

    Derby ships on Spark's own classpath (it backs the Hive
    metastore), which makes it the zero-install way to exercise the
    real JDBC read/write path in tests and local pipelines. Embedded
    Derby lives inside the driver JVM — a single-process fixture, not
    a multi-executor store; point ``read_jdbc``/``write_jdbc`` at a
    networked database for anything real.
    """
    return f"jdbc:derby:memory:{name};create=true"
