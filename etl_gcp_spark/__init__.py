"""etl_gcp_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark reimplementation of the query & data-processing
capabilities of the reference pipeline (``iamadityavarma/ETL-GCP``,
surveyed in SURVEY.md): schema-inferring ingestion, column
normalization, cleaning, deduplication, validation, and one-pass
quality metrics — extended with the relational closure (joins,
window functions, rollups, set ops) and large-scale training-data
operators (exact/near-dup dedup, similarity search, text analysis,
multimodal columns, streaming ingestion).

Design stance (SURVEY.md §7.0): DataFrame-native and lazy end-to-end.
Every operator is expressed against the DataFrame/SQL API so Catalyst
performs predicate pushdown, column pruning, join planning, and
whole-stage codegen; Python touches data only through Arrow-batched
Pandas UDFs in the few operators that need imperative logic.
"""

from etl_gcp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
