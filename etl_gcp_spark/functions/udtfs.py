"""Python UDTFs — the table-function third of the extension surface.

The reference has no UDF/UDAF/UDTF layer at all (SURVEY.md §2.10); the
engine exposes all three Spark extension points: vectorized
``pandas_udf`` (functions/multimodal.py), grouped-state
``applyInPandasWithState`` (streaming/events.py), and — here — the
Spark 4 user-defined TABLE function: one input row → many output
rows, composed with ``LATERAL`` so each document fans out next to its
own id.

UDTFs are row-at-a-time Python (slower than the JVM path by design);
they are the right tool when the fan-out logic is genuinely
imperative. For the fixed-window chunker below a pure-JVM equivalent
exists (``sequence`` + ``transform`` + ``slice``), and the unit tests
assert both produce identical rows — the UDTF is the extension-surface
contract, the built-in chain is the 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Fixed-window training-data chunker: emit overlapping
    ``window``-token chunks every ``stride`` tokens.

    Tokenization is ``split(' ')`` (empties kept for space runs) to
    stay bit-compatible with the SQL oracle's ``string_split``.
    """

    def eval(self, text: str, window: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        start = 0
        idx = 0
        while start < len(toks):
            piece = toks[start : start + window]
            yield idx, " ".join(piece), len(piece)
            idx += 1
            start += stride


def chunk_documents_udtf(
    spark: SparkSession,
    documents: DataFrame,
    *,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Chunk every document via the :class:`ChunkText` UDTF with a
    LATERAL join — the doc_id rides along from the outer table."""
    spark.udtf.register("chunk_text", ChunkText)
    documents.select("doc_id", "text").createOrReplaceTempView(
        "__docs_to_chunk"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM __docs_to_chunk d,
             LATERAL chunk_text(d.text, {int(window)}, {int(stride)}) c
        """
    )


def chunk_documents_builtin(
    documents: DataFrame,
    *,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """The same chunker on the JVM path: tokenize once, generate the
    chunk starts with ``sequence``, explode, ``slice`` each window —
    no Python in the plan, whole-stage codegen end to end. This is
    the formulation to run at corpus scale; the UDTF twin exists to
    exercise the extension surface.
    """
    toks = documents.select(
        "doc_id", F.split("text", " ").alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    starts = toks.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("__n") - 1) / F.lit(int(stride))).cast("int"),
            )
        ),
    )
    piece = F.slice(
        "__toks", F.col("chunk_idx") * F.lit(int(stride)) + 1, F.lit(int(window))
    )
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("int").alias("n_tokens"),
    )
