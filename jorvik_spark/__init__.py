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
