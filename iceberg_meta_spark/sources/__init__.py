from iceberg_meta_spark.sources.parquet import BASE_TABLES, load_table, register_views
