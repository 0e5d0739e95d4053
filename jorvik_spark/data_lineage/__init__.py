from jorvik_spark.data_lineage.observer import DataLineageLogger  # noqa: F401
