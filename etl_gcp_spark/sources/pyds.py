"""Custom Python DataSource (Spark 4 API): the reference's chunked
CSV transient layer as a first-class, partition-parallel source.

The reference materializes extracts as ``cdc_chunk_%04d.csv`` blobs
under a prefix (data_extractor.py:95-108, :205-217), then lists,
lexicographically sorts, and serially downloads them
(data_extractor.py:122-135). Re-expressed on the Spark 4
``pyspark.sql.datasource`` API:

- ``partitions()`` performs the listing+sort (reference S4) ONCE on
  the driver and emits one ``InputPartition`` per chunk;
- ``read(partition)`` parses a single chunk on an executor — the
  reference's serial download loop becomes an embarrassingly
  parallel scan with per-file task granularity;
- the declared schema replaces per-chunk pandas inference (reference
  C1), so every partition parses to identical types.

For plain CSV directories ``spark.read.csv`` is strictly better
(JVM parser, pushdown); this source exists for protocol-shaped
layouts where listing, ordering, and parsing need custom logic —
exactly what the Python DataSource API is for.
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
)


class ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ChunkedCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.pattern = options.get("pattern", "cdc_chunk_*.csv")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, self.pattern)))
        if not files:
            raise FileNotFoundError(
                f"no chunks matching {self.pattern} under {self.path}"
            )
        return [ChunkPartition(f) for f in files]

    def read(self, partition: ChunkPartition):
        casts = []
        for f in self.schema.fields:
            if isinstance(f.dataType, LongType):
                casts.append(int)
            elif isinstance(f.dataType, DoubleType):
                casts.append(float)
            elif isinstance(f.dataType, StringType):
                casts.append(str)
            else:
                raise TypeError(
                    f"chunked_csv supports long/double/string, got {f.dataType}"
                )
        with open(partition.path, newline="") as fh:
            rows = csv.reader(fh)
            header = next(rows)
            idx = [header.index(f.name) for f in self.schema.fields]
            for row in rows:
                yield tuple(
                    cast(row[i]) if row[i] != "" else None
                    for cast, i in zip(casts, idx)
                )


class ChunkedCsvDataSource(DataSource):
    """Usage:

    >>> spark.dataSource.register(ChunkedCsvDataSource)
    >>> df = (spark.read.format("chunked_csv")
    ...       .schema("n_nationkey long, n_name string")
    ...       .option("path", "/tmp/chunks").load())
    """

    @classmethod
    def name(cls) -> str:
        return "chunked_csv"

    def reader(self, schema: StructType) -> ChunkedCsvReader:
        return ChunkedCsvReader(schema, dict(self.options))


def write_reference_chunks(
    df, path: str, *, rows_per_chunk: int = 10
) -> list[str]:
    """Materialize a (small) DataFrame in the reference's chunk
    layout — ``cdc_chunk_%04d.csv`` with a header row — for tests
    and demos of the source above. Driver-side by design: it
    reproduces the reference WRITER's protocol (data_extractor.py:
    205-217), not a scale path."""
    os.makedirs(path, exist_ok=True)
    for stale in glob.glob(os.path.join(path, "cdc_chunk_*.csv")):
        os.remove(stale)
    # guard the driver-side collect: this writer exists for fixtures;
    # a caller pointing it at a real table should get a loud error,
    # not an OOM'd driver
    n = df.count()
    if n > 1_000_000:
        raise ValueError(
            f"write_reference_chunks collects to the driver ({n} rows); "
            "it is a fixture writer — use write_chunked_csv for real data"
        )
    rows = df.collect()
    cols = df.columns
    out = []
    for c, start in enumerate(range(0, len(rows), rows_per_chunk)):
        fp = os.path.join(path, f"cdc_chunk_{c:04d}.csv")
        with open(fp, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(cols)
            for r in rows[start : start + rows_per_chunk]:
                w.writerow([r[c2] for c2 in cols])
        out.append(fp)
    return out
