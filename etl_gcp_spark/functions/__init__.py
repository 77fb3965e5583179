from etl_gcp_spark.functions import multimodal, retrieval, similarity, text

__all__ = ["multimodal", "similarity", "text"]
