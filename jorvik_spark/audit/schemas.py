"""Schema audit: subset / equality checks on StructType.

Reference: /root/reference/jorvik/audit/schemas.py:4-56. Two deliberate
fixes over the reference (SURVEY.md Appendix A):

* Q4 — the reference's nested-struct check is dead code
  (``isinstance(field, StructType)`` on a StructField is never True); here
  nested comparison recurses on ``field.dataType``.
* Q5 — the reference claims nullability-insensitivity but compares nested
  dataTypes with ``!=``, which is nullability-sensitive below the top
  level; here nullability is normalized recursively (structs, arrays,
  maps) before comparison.

Both checks are name-keyed and order-insensitive, like the reference.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DataType, MapType, StructField, StructType


def _normalize(dt: DataType) -> DataType:
    """Strip nullability and field order at every nesting level."""
    if isinstance(dt, StructType):
        fields = sorted(dt.fields, key=lambda f: f.name)
        return StructType(
            [StructField(f.name, _normalize(f.dataType), True) for f in fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_normalize(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_normalize(dt.keyType), _normalize(dt.valueType), True)
    return dt


def _field_map(schema: StructType) -> dict:
    """Name → normalized type. Duplicate column names (a DataFrame after a
    join with an un-dropped key is the common case) would silently collapse
    in the dict and make a 2-column duplicate pass validation against a
    schema declaring the column once — fail loudly instead, at the schema
    contract where the problem is actionable."""
    names = [f.name for f in schema.fields]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"Schema has duplicate column names {dupes}; drop or rename "
            "them before schema verification (typically an un-dropped "
            "join key)."
        )
    return {f.name: _normalize(f.dataType) for f in schema.fields}


def is_subset(schema: StructType, reference: StructType) -> bool:
    """True if every field of ``schema`` exists in ``reference`` with the
    same type (ignoring nullability, column order, nested field order).

    Used for input contracts: extra physical columns are tolerated
    (reference etl.py:189-199).
    """
    ref = _field_map(reference)
    sub = _field_map(schema)
    return all(name in ref and dt == ref[name] for name, dt in sub.items())


def are_equal(s1: StructType, s2: StructType) -> bool:
    """Name-keyed equality, ignoring column order and nullability at every
    nesting level (reference schemas.py:27-56 docstring contract).
    """
    return _field_map(s1) == _field_map(s2)


def diff(s1: StructType, s2: StructType) -> str:
    """Readable schema diff for verification error messages."""
    f1 = {f.name: f.dataType.simpleString() for f in s1.fields}
    f2 = {f.name: f.dataType.simpleString() for f in s2.fields}
    lines = []
    for name in sorted(set(f1) | set(f2)):
        if name not in f2:
            lines.append(f"  - {name}: {f1[name]} (only in first)")
        elif name not in f1:
            lines.append(f"  + {name}: {f2[name]} (only in second)")
        elif f1[name] != f2[name]:
            lines.append(f"  ~ {name}: {f1[name]} != {f2[name]}")
    return "\n".join(lines) or "  (schemas equal)"
