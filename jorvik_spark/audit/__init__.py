from jorvik_spark.audit import schemas  # noqa: F401
