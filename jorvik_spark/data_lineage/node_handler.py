"""Classify leaf plan nodes into data sources.

Reference: /root/reference/jorvik/data_lineage/node_handler.py:11-69.
Three source families: file scans (9 formats, path inside the first
``[...]`` of the Location property, with truncated-path repair), in-memory
relations, and JDBC relations (SQL text embedded in the node name).
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

from jorvik_spark.data_lineage.execution_plan import PlanNode

FILE_BASED_SCANS = frozenset(
    f"Scan {fmt}"
    for fmt in (
        "delta", "parquet", "orc", "avro", "csv", "json", "text", "xml",
        "binaryFile",
    )
)
MEMORY_SCANS = frozenset({"Scan ExistingRDD", "LocalTableScan"})

_TRUNCATION = re.compile(r", \.\.\. \d+ entries")
_FIRST_BRACKET = re.compile(r"\[([^\[\]]+)\]")


class ScanDataSource(NamedTuple):
    scan_type: str
    location: Optional[str]


# Reference-parity alias.
SparkScanDataSource = ScanDataSource


def extract_first_bracket_content(s: str) -> Optional[str]:
    m = _FIRST_BRACKET.search(s)
    return m.group(1) if m else None


def handle_truncated_path(path: Optional[str]) -> Optional[str]:
    """Repair ``..., N entries`` truncated locations: strip the partition
    component (first ``=``) and cut back to the containing directory.

    ``/lake/raw/bookings/date_part=2024-07-02/x.avro, ... 13 entries``
    → ``/lake/raw/bookings``
    """
    if path is None:
        return None
    if not _TRUNCATION.search(path):
        return path
    # Work on the FIRST listed path: for an unpartitioned multi-file
    # location ("/w/t/part-0.parquet, /w/t/part-1.parquet, … 20 entries")
    # splitting the full comma-joined list on '=' would cut at the LAST
    # path's slash and yield garbage like "/w/t/part-0.parquet, /w/t".
    first = path.split(", ")[0]
    prefix = first.split("=")[0]
    return prefix[: prefix.rfind("/")]


def extract_data_source(node: PlanNode) -> ScanDataSource:
    """Classify one leaf node (reference node_handler.py:49-69)."""
    name = node.name or ""
    # Prefix match, not equality: catalog-table scans carry the qualified
    # table name in the node name ("Scan parquet spark_catalog.default.t")
    # and must still classify as file scans — their Location property holds
    # the real path.
    if name in FILE_BASED_SCANS or any(
        name.startswith(s + " ") for s in FILE_BASED_SCANS
    ):
        location = node.properties.get("Location")
        if location is not None:
            location = extract_first_bracket_content(location)
        return ScanDataSource("file_scan", handle_truncated_path(location))
    if name in MEMORY_SCANS:
        return ScanDataSource("memory_scan", name)
    if "Scan JDBCRelation" in name:
        # e.g. Scan JDBCRelation((select * from T) SPARK_GEN_SUBQ_0) [numPartitions=1]
        parts = name.split("JDBCRelation((", 1)
        if len(parts) == 2:
            return ScanDataSource(
                "jdbc_scan", parts[1].split(") SPARK_GEN_SUBQ", 1)[0]
            )
        # The tree-line name was cut at the first paren — still a JDBC
        # scan, just without the embedded SQL text.
        return ScanDataSource("jdbc_scan", name)
    return ScanDataSource("unknown_scan", name or None)
