"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The extension surface a lake user reaches for when a format has no
built-in reader (proprietary telemetry dumps, bespoke binary logs,
service APIs): subclass ``DataSource``, emit ``InputPartition`` splits,
and each executor reads its split in parallel — the same
partition-parallel contract as the JVM sources, with rows crossing via
Arrow. Two sources are registered:

* ``jorvik_synthetic`` — a deterministic generator (id, bucket, value)
  over a row range. Every value is a pure integer/md5-free function of
  the row id, so a DuckDB ``range()`` twin reproduces it exactly —
  which is what makes the datasource PLUMBING (partition fan-out,
  option parsing, schema declaration, Arrow row transfer) value-hash
  checkable by the driver, not just smoke-tested.
* ``jorvik_jsonl`` — newline-delimited JSON over a directory, one
  partition per file, declared schema (no inference pass — at 100 TB an
  inference scan is a full extra read).

Scale notes: ``partitions()`` runs on the driver and must stay metadata
-sized (ranges / file lists — never rows); ``read(partition)`` runs on
executors, one Python worker per split, Arrow-batched back to the JVM.
A Python source will not beat a native parquet scan — it is the
*escape hatch* for formats Spark lacks, feeding a parquet rewrite as
its first act (see ``scan_python_datasource``'s docstring).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SYNTH_SCHEMA = "id long, bucket int, value long"
# value: a little integer hash — multiply by an odd constant, fold, mod.
# Chosen to be expressible identically in ANSI SQL (no overflow below
# ~2e5 rows × 1e6 multiplier in int64; the query caps n accordingly).
_MULT = 1_000_003
_MOD = 999_983


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticDataSource(DataSource):
    """``spark.read.format("jorvik_synthetic").option("n", N)
    .option("parts", P)`` — N deterministic rows across P partitions."""

    @classmethod
    def name(cls) -> str:
        return "jorvik_synthetic"

    def schema(self) -> str:
        return _SYNTH_SCHEMA

    def reader(self, schema: StructType) -> "SyntheticReader":
        return SyntheticReader(self.options)


class SyntheticReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._n = int(options.get("n", 1000))
        self._parts = max(1, int(options.get("parts", 8)))

    def partitions(self) -> Sequence[InputPartition]:
        if self._n <= 0:
            # a zero-row source still needs ONE split: Spark's Python
            # datasource path errors on an empty partition list
            return [_RangePartition(0, 0)]
        step = -(-self._n // self._parts)  # ceil div
        return [
            _RangePartition(s, min(s + step, self._n))
            for s in range(0, self._n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, i % 16, (i * _MULT) % _MOD)


@dataclass
class _FilePartition(InputPartition):
    path: str


class JsonlDataSource(DataSource):
    """``spark.read.format("jorvik_jsonl").schema(s).load(dir)`` —
    newline-delimited JSON, one partition per file, declared schema
    (fields read by name; missing keys are null — the tolerant contract
    an evolving log format needs)."""

    @classmethod
    def name(cls) -> str:
        return "jorvik_jsonl"

    def schema(self) -> str:
        # Used only if the caller declares none; a real deployment
        # always declares (inference would need a driver-side read).
        return "value string"

    def reader(self, schema: StructType) -> "JsonlReader":
        return JsonlReader(self.options, schema)


class JsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jorvik_jsonl requires a load(path)")
        self._fields = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isdir(self._path):
            return [
                _FilePartition(e.path)
                for e in sorted(os.scandir(self._path), key=lambda e: e.name)
                if e.is_file() and not e.name.startswith(("_", "."))
            ]
        return [_FilePartition(self._path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(f) for f in self._fields)


def register(spark) -> None:
    """Idempotently register both sources on the session."""
    spark.dataSource.register(SyntheticDataSource)
    spark.dataSource.register(JsonlDataSource)
