from etl_gcp_spark.operators.clean import (
    audit_stamp,
    clean,
    drop_meta,
    normalize_columns,
)
from etl_gcp_spark.operators.dedup import dedup, dedup_keep_first, dup_count

__all__ = [
    "audit_stamp",
    "clean",
    "drop_meta",
    "normalize_columns",
    "dedup",
    "dedup_keep_first",
    "dup_count",
]
