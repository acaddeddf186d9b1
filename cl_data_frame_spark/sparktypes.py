"""Element-type declarations -> Spark DataTypes.

The reference lets callers declare per-column element types (``element-type``
keyword of ``map-rows`` cl-data-frame.lisp:506,510, ``replace-column!``
cl-data-frame.lisp:570, and ``map-df`` result specs cl-data-frame.lisp:528-537;
tests declare ``fixnum`` and ``bit``, cl-data-frame-tests.lisp:85). Spark
columns are homogeneous, so declared types become explicit ``StructField``
dataTypes; the undeclared ``t`` maps to inference (SURVEY.md §1.3, §1.7).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Lisp-style names the reference uses, plus pragmatic Python/SQL aliases.
_NAME_TO_TYPE: dict[str, T.DataType] = {
    "t": T.StringType(),  # heterogeneous columns widen to string (SURVEY §7.4.2)
    "bit": T.BooleanType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "fixnum": T.LongType(),
    "integer": T.LongType(),
    "int": T.LongType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "single-float": T.FloatType(),
    "float": T.FloatType(),
    "double-float": T.DoubleType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "string": T.StringType(),
    "str": T.StringType(),
    "symbol": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def to_spark_type(element_type) -> T.DataType:
    """Resolve an element-type declaration to a Spark DataType.

    Accepts a Spark ``DataType`` (passed through), a Python builtin type
    (``int``/``float``/``bool``/``str``/``bytes``), or a name string from
    the table above (including the reference's ``fixnum``/``bit``/``t``).
    """
    if isinstance(element_type, T.DataType):
        return element_type
    if element_type is None:
        return T.StringType()
    if element_type is int:
        return T.LongType()
    if element_type is float:
        return T.DoubleType()
    if element_type is bool:
        return T.BooleanType()
    if element_type is str:
        return T.StringType()
    if element_type is bytes:
        return T.BinaryType()
    if isinstance(element_type, str):
        name = element_type.strip().lower()
        if name in _NAME_TO_TYPE:
            return _NAME_TO_TYPE[name]
        # fall through to Spark's DDL parser for things like "array<float>"
        return T._parse_datatype_string(element_type)
    raise TypeError(f"Cannot resolve element type {element_type!r}")
