"""polars_genson_spark.plans"""
