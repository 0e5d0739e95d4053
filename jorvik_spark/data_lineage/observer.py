"""DataLineageLogger: a storage output-observer that appends one lineage
row per write.

Reference: /root/reference/jorvik/data_lineage/observer.py:22-105. On every
``(df, output_path)`` write event: capture the physical plan, collect leaf
scan nodes, classify their sources, and append
``{output_path, data_sources: array<string>, transform_code_file,
observation_ts}`` to the lineage log table.

Deliberate deviation (quirk Q11, SURVEY.md Appendix A): the explain
watchdog uses a daemon worker thread + timed join instead of SIGALRM, so
lineage capture works off the main thread and on any OS, and a hung
explain cannot block interpreter shutdown. Log
writes go through a non-lineage-tracking storage (recursion guard, quirk
Q10 kept), in Delta when available, else parquet.
"""

from __future__ import annotations

import threading
import warnings
from datetime import datetime
from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from jorvik_spark.data_lineage import execution_plan, node_handler
from jorvik_spark.utils import paths

LINEAGE_SCHEMA = StructType(
    [
        StructField("output_path", StringType(), True),
        StructField("data_sources", ArrayType(StringType(), True), True),
        StructField("transform_code_file", StringType(), True),
        StructField("observation_ts", TimestampType(), True),
    ]
)


class DataLineageLogger:
    """Observer appending lineage rows to ``lineage_log_path``."""

    def __init__(self, lineage_log_path: str, timeout: int = 300):
        self.lineage_log_path = lineage_log_path
        self.timeout = timeout

    def _explain_dataframe(self, df: DataFrame) -> str:
        """Capture the plan with a thread-based watchdog (Q11 fix).

        A plain daemon thread, not a ThreadPoolExecutor: executor workers
        are non-daemon, so an abandoned hung explain would block
        interpreter shutdown; a daemon thread lets the process exit. On
        timeout the hung thread is deliberately abandoned — the write
        path must not stall behind a stuck explain.
        """
        box: list = []

        def run() -> None:
            try:
                box.append(("ok", execution_plan.capture_explain(df)))
            except BaseException as exc:  # re-raised on the caller thread
                box.append(("err", exc))

        worker = threading.Thread(
            target=run, daemon=True, name="lineage-explain"
        )
        worker.start()
        worker.join(self.timeout)
        if not box:
            return (
                "ERROR. Unable to read dataframe execution plan. "
                f"Timed out after {self.timeout} seconds."
            )
        kind, value = box[0]
        if kind == "err":
            raise value
        return value

    def _get_data_scan_nodes(self, explain_result: str) -> List[execution_plan.PlanNode]:
        """Leaf nodes of the plan tree; an ``AdaptiveSparkPlan`` leaf marks
        a nested cached plan and is dropped (reference observer.py:51-59)."""
        tree = execution_plan.build_execution_tree(explain_result)
        return [n for n in tree.leaves if n.name != "AdaptiveSparkPlan"]

    def _get_data_sources(self, df: DataFrame) -> List[str]:
        explain_result = self._explain_dataframe(df)
        if explain_result.startswith("ERROR"):
            return [explain_result]
        sources = []
        for node in self._get_data_scan_nodes(explain_result):
            src = node_handler.extract_data_source(node)
            if src.scan_type == "file_scan":
                sources.append(src.location)
            else:
                sources.append(f"{src.scan_type}: {src.location}")
        return sources

    def _create_lineage_log(
        self, data_sources: List[str], output_path: str, code_file_path: str
    ) -> DataFrame:
        spark = SparkSession.getActiveSession()
        row = [[output_path, data_sources, code_file_path, datetime.now()]]
        return spark.createDataFrame(row, LINEAGE_SCHEMA)

    def _store_lineage_log(self, lineage_log: DataFrame) -> None:
        from jorvik_spark import storage  # lazy: avoid circular import
        from jorvik_spark.storage.basic import _MERGE_CREATE_FORMAT

        st = storage.configure(track_lineage=False)  # recursion guard (Q10)
        st.write(
            lineage_log, self.lineage_log_path,
            format=_MERGE_CREATE_FORMAT, mode="append",
        )

    def update(self, df: DataFrame, output_path: str) -> None:
        """Capture and append one lineage row — BEST-EFFORT.

        Deliberate deviation from the reference (observer.py:101-105
        propagates): update() runs AFTER the user's data has landed, so a
        lineage-only failure (log path outside the isolation mount, log
        table locked, plan-capture error) must not turn a successful
        write into a caller-visible exception — with the reference's
        propagate-everything behavior, one misconfigured lineage path
        fails every write in the pipeline. Failures surface as a warning
        carrying the output path, so telemetry loss is visible without
        being fatal.
        """
        try:
            data_sources = self._get_data_sources(df)
            code_file = paths.get_codefile_path()
            self._store_lineage_log(
                self._create_lineage_log(data_sources, output_path, code_file)
            )
        except Exception as exc:  # noqa: BLE001 — telemetry must not fail IO
            warnings.warn(
                f"Data-lineage capture failed for {output_path!r} "
                f"({type(exc).__name__}: {exc}); the data write itself "
                "succeeded.",
                stacklevel=2,
            )
