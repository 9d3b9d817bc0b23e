"""polars_genson_spark.functions"""
