from etl_gcp_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_csv_inferred,
    read_http_csv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv_inferred",
    "read_http_csv",
]
