from etl_gcp_spark.sinks.writers import write_chunked_csv, write_table

__all__ = ["write_chunked_csv", "write_table"]
