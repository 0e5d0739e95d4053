from jorvik_spark.pipelines.etl import (  # noqa: F401
    ETL,
    FileInput,
    FileOutput,
    Input,
    MergeDeltaOutput,
    MergeOutput,
    Output,
    StreamFileInput,
    StreamFileOutput,
    etl,
)
