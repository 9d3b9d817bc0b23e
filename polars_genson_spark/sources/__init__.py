"""polars_genson_spark.sources"""
