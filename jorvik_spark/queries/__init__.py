"""Query library: importing this package populates the registry.

Each module registers its queries via ``@query`` (registry.py); the driver
contract in ``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLES``.
"""

from jorvik_spark.queries.registry import ORACLES, QUERIES  # noqa: F401

# Import order = SURVEY.md §2B/§2C category order. Each import registers.
from jorvik_spark.queries import storage_ops  # noqa: F401,E402
from jorvik_spark.queries import projections  # noqa: F401,E402
from jorvik_spark.queries import joins  # noqa: F401,E402
from jorvik_spark.queries import aggregates  # noqa: F401,E402
from jorvik_spark.queries import windows  # noqa: F401,E402
from jorvik_spark.queries import udfs  # noqa: F401,E402
from jorvik_spark.queries import text_analysis  # noqa: F401,E402
from jorvik_spark.queries import dedup  # noqa: F401,E402
from jorvik_spark.queries import similarity  # noqa: F401,E402
from jorvik_spark.queries import multimodal  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES"]
