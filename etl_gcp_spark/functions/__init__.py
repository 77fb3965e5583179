from etl_gcp_spark.functions import multimodal, similarity, text

__all__ = ["multimodal", "similarity", "text"]
