"""ETL pipeline framework (reference: /root/reference/jorvik/pipelines/etl.py:13-217).

An ETL binds typed Inputs/Outputs (each carrying a declared StructType) to
a transform function:

    run() = extract → verify input schemas (subset) → transform
          → verify output schemas (equality) → load

Deliberate deviation (quirk Q1, SURVEY.md Appendix A): the reference's
``MergeDeltaOutput.load`` passes ``merge_schemas``/``update_condition``/
``insert_condition`` positionally into ``merge`` one slot to the left
(merge_schemas lands in partition_fields, …). Here every storage call uses
keyword arguments — faithful to the documented intent.
"""

from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Callable, List, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from jorvik_spark import storage
from jorvik_spark.audit import schemas

_SCHEMA_WARNING = (
    "Missing schema definition. Specifying a schema increases a jobs "
    "cohesion and robustness."
)


def _warn_if_no_schema(node) -> None:
    if node.schema is None:
        warnings.warn(_SCHEMA_WARNING, UserWarning, stacklevel=3)


@dataclass
class Input(ABC):
    """A data source with a declared schema (reference etl.py:13-20)."""

    schema = None

    @abstractmethod
    def extract(self) -> DataFrame:
        ...


@dataclass
class Output(ABC):
    """A data sink with a declared schema (reference etl.py:23-30)."""

    schema = None

    @abstractmethod
    def load(self, df: DataFrame) -> None:
        ...


@dataclass
class FileInput(Input):
    """Batch file source (reference etl.py:33-51)."""

    path: str
    format: str = "parquet"
    options: dict = None
    schema: StructType = None

    def __post_init__(self):
        _warn_if_no_schema(self)

    def extract(self) -> DataFrame:
        st = storage.configure()
        return st.read(self.path, self.format, self.options)


@dataclass
class StreamFileInput(Input):
    """Streaming file source (reference etl.py:54-72). The declared schema
    is passed to the stream reader (Q3 fix) instead of being re-inferred."""

    path: str
    format: str = "parquet"
    options: dict = None
    schema: StructType = None

    def __post_init__(self):
        _warn_if_no_schema(self)

    def extract(self) -> DataFrame:
        st = storage.configure()
        return st.readStream(self.path, self.format, self.options, schema=self.schema)


@dataclass
class FileOutput(Output):
    """Batch file sink (reference etl.py:75-95)."""

    path: str
    format: str = "parquet"
    mode: str = "append"
    partition_fields: Union[str, List[str]] = ""
    options: dict = None
    schema: StructType = None

    def __post_init__(self):
        _warn_if_no_schema(self)

    def load(self, df: DataFrame) -> None:
        st = storage.configure()
        st.write(
            df,
            self.path,
            format=self.format,
            mode=self.mode,
            partition_fields=self.partition_fields,
            options=self.options,
        )


@dataclass
class MergeOutput(Output):
    """Upsert sink (reference etl.py:98-119 MergeDeltaOutput, with the Q1
    positional-argument bug fixed by calling merge with keywords)."""

    path: str
    merge_condition: str
    merge_schemas: bool = False
    update_condition: Union[str, bool, None] = None
    insert_condition: Union[str, bool, None] = None
    delete_condition: Union[str, bool, None] = None
    partition_fields: Union[str, List[str]] = ""
    schema: StructType = None

    def __post_init__(self):
        _warn_if_no_schema(self)

    def load(self, df: DataFrame) -> None:
        st = storage.configure()
        st.merge(
            df,
            self.path,
            self.merge_condition,
            partition_fields=self.partition_fields,
            merge_schemas=self.merge_schemas,
            update_condition=self.update_condition,
            insert_condition=self.insert_condition,
            delete_condition=self.delete_condition,
        )


# API-parity alias for reference users.
MergeDeltaOutput = MergeOutput


@dataclass
class StreamFileOutput(Output):
    """Streaming file sink with checkpoint (reference etl.py:122-142)."""

    path: str
    checkpoint: str
    format: str = "parquet"
    partition_fields: Union[str, List[str]] = ""
    options: dict = None
    schema: StructType = None

    def __post_init__(self):
        _warn_if_no_schema(self)

    def load(self, df: DataFrame):
        st = storage.configure()
        return st.writeStream(
            df,
            self.path,
            format=self.format,
            checkpoint=self.checkpoint,
            partition_fields=self.partition_fields,
            options=self.options,
        )


class ETL:
    """Pipeline object (reference etl.py:145-217)."""

    def __init__(
        self,
        inputs: Union[List[Input], Input],
        outputs: Union[List[Output], Output],
        transform_func: Callable[..., Union[DataFrame, Tuple[DataFrame, ...]]],
        validate_schemas: bool = True,
    ):
        self.inputs = inputs if isinstance(inputs, list) else [inputs]
        self.outputs = outputs if isinstance(outputs, list) else [outputs]
        self.transform_func = transform_func
        self.validate_schemas = validate_schemas

    def __call__(self):
        self.run()

    def extract(self) -> Tuple[DataFrame, ...]:
        return tuple(i.extract() for i in self.inputs)

    def load(self, *transformed: DataFrame) -> list:
        """Load each output; returns the per-output load results.

        Deviation from the reference (etl.py:166-171 returns None): a
        ``StreamFileOutput.load`` returns its ``StreamingQuery``, and
        discarding it leaves the caller no handle to await or stop the
        stream — a script exiting right after ``run()`` would kill the
        query mid-batch with no way to drain it. Batch outputs contribute
        ``None`` entries; callers that ignore the return value are
        unaffected.
        """
        if len(transformed) != len(self.outputs):
            raise RuntimeError(
                "Number of transformed dataframes must match number of outputs"
            )
        return [out.load(df) for df, out in zip(transformed, self.outputs)]

    def run(self) -> list:
        data = self.extract()
        if self.validate_schemas:
            self.verify_input_schemas(data)

        transformed = self.transform_func(*data)
        if not isinstance(transformed, tuple):
            transformed = (transformed,)

        if self.validate_schemas:
            self.verify_output_schemas(transformed)

        return self.load(*transformed)

    def verify_input_schemas(self, data: Tuple[DataFrame, ...]) -> None:
        """Input contract: declared ⊆ actual (reference etl.py:189-199)."""
        for node, df in zip(self.inputs, data):
            if node.schema is None:
                raise RuntimeError(
                    "No schema defined for input and the validate_schemas "
                    "parameter is set to True. To suppress this set the "
                    "validate_schemas parameter to False."
                )
            if not schemas.is_subset(node.schema, df.schema):
                raise RuntimeError(
                    "Input schema did not match expectations\n"
                    + schemas.diff(node.schema, df.schema)
                )

    def verify_output_schemas(self, data: Tuple[DataFrame, ...]) -> None:
        """Output contract: declared == actual, order- and nullability-
        insensitive (reference etl.py:201-211)."""
        for node, df in zip(self.outputs, data):
            if node.schema is None:
                raise RuntimeError(
                    "No schema defined for output and the validate_schemas "
                    "parameter is set to True. To suppress this set the "
                    "validate_schemas parameter to False."
                )
            if not schemas.are_equal(node.schema, df.schema):
                raise RuntimeError(
                    "Output schema did not match expectations\n"
                    + schemas.diff(node.schema, df.schema)
                )


def etl(
    inputs: Union[List[Input], Input],
    outputs: Union[List[Output], Output],
    validate_schemas: bool = True,
):
    """Decorator form: ``@etl(inputs=..., outputs=...)`` over a transform
    function returns a ready ETL (reference etl.py:213-217)."""

    def wrapper(func):
        return ETL(inputs, outputs, func, validate_schemas=validate_schemas)

    return wrapper
