"""Storage protocols (reference: /root/reference/jorvik/storage/protocols.py).

Structural typing only — any object with these methods is a Storage; the
concrete implementations are BasicStorage and IsolatedStorage.
"""

from __future__ import annotations

from typing import List, Optional, Protocol, runtime_checkable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


@runtime_checkable
class OutputObserver(Protocol):
    """Observer of write events (reference protocols.py:6-13)."""

    def update(self, df: DataFrame, output_path: str) -> None:
        ...


@runtime_checkable
class Storage(Protocol):
    """The storage surface (reference protocols.py:17-111)."""

    def read(self, path: str, format: str = "delta", options: dict = None) -> DataFrame:
        ...

    def readStream(
        self, path: str, format: str = "delta", options: dict = None
    ) -> DataFrame:
        ...

    def write(
        self,
        df: DataFrame,
        path: str,
        format: str = "delta",
        mode: str = "append",
        partition_fields: Optional[List[str]] = None,
        options: dict = None,
    ) -> None:
        ...

    def writeStream(
        self,
        df: DataFrame,
        path: str,
        checkpoint: str,
        format: str = "delta",
        partition_fields: Optional[List[str]] = None,
        options: dict = None,
    ) -> StreamingQuery:
        ...

    def merge(
        self,
        df: DataFrame,
        path: str,
        merge_condition: str,
        partition_fields: Optional[List[str]] = None,
        merge_schemas: bool = False,
        update_condition: Optional[str] = None,
        insert_condition: Optional[str] = None,
        delete_condition: Optional[str] = None,
    ) -> None:
        ...

    def exists(self, path: str) -> bool:
        ...
