"""jorvik_spark — a PySpark-native analytics/ETL engine.

A clean-room, Spark-first re-implementation of the capability surface of
jorvik-io/jorvik (reference snapshot read-only at /root/reference), plus a
first-class relational query library and large-scale training-data operators
(dedup, similarity search, multimodal columns, text analysis).

Design principles (SURVEY.md §7):
  * DataFrame/SQL first — Catalyst plans everything; no RDDs.
  * No ``collect()`` / driver-side loops in operator paths.
  * Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
    pandas UDFs only where built-ins cannot express the semantics.
  * AQE on; broadcast small dimensions; documented salting for skew.
"""

__version__ = "0.1.0"

# Top-level API mirrors the reference's (/root/reference/jorvik/__init__.py)
# so a reference user's imports port by renaming the package alone:
#   from jorvik import etl, FileInput, configure_storage
#   from jorvik_spark import etl, FileInput, configure_storage
from jorvik_spark.data_lineage.observer import DataLineageLogger  # noqa: E402,F401
from jorvik_spark.pipelines import (  # noqa: E402,F401
    FileInput,
    FileOutput,
    Input,
    Output,
    StreamFileInput,
    StreamFileOutput,
    etl,
)
from jorvik_spark import storage  # noqa: E402

Storage = storage.Storage
configure_storage = storage.configure

__all__ = [
    "DataLineageLogger",
    "configure_storage",
    "Storage",
    "etl",
    "FileInput",
    "FileOutput",
    "StreamFileInput",
    "StreamFileOutput",
    "Input",
    "Output",
    "__version__",
]
