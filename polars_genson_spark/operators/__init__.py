"""polars_genson_spark.operators"""
