"""polars_genson_spark.streaming"""
