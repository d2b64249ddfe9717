"""Iceberg column-bound decoding (reference F8).

Data-file lower/upper bounds arrive as ``map<field_id, binary>`` whose values
use Iceberg's *single-value serialization* (Appendix D of the public Iceberg
table spec): little-endian fixed widths for numerics, UTF-8 for strings —
the encoding pyiceberg's ``conversions.from_bytes`` reads and the reference
decodes at formatters.py:581-591.

Preferred path on a real deployment: the ``readable_metrics`` struct of the
``.files`` metadata table (the Iceberg runtime decodes server-side, no
Python). This module is the fallback when only raw bound bytes are present —
per SURVEY §2.10 the single justified Python UDF in the engine, and it is a
*vectorized* Pandas UDF (one Arrow batch per call, not per-row pickling).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)


def decode_bound_bytes(raw: bytes | None, type_name: str):
    """One bound value: Iceberg single-value binary -> Python scalar.

    Types follow the spec: int=4B LE, long=8B LE, float=4B IEEE LE,
    double=8B IEEE LE, boolean=1B (0x00/0x01), string=UTF-8, date=int days,
    timestamp[tz]=long micros.
    """
    if raw is None:
        return None
    if type_name in ("int", "date"):
        return struct.unpack("<i", raw)[0]
    if type_name in ("long", "timestamp", "timestamptz", "time"):
        return struct.unpack("<q", raw)[0]
    if type_name == "float":
        return struct.unpack("<f", raw)[0]
    if type_name == "double":
        return struct.unpack("<d", raw)[0]
    if type_name == "boolean":
        return raw[0] != 0
    if type_name == "string":
        return raw.decode("utf-8")
    raise ValueError(f"unsupported bound type {type_name!r} (non-primitive bounds are skipped)")


_SPARK_TYPE: dict[str, DataType] = {
    "int": IntegerType(),
    "date": IntegerType(),
    "long": LongType(),
    "timestamp": LongType(),
    "timestamptz": LongType(),
    "time": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "boolean": BooleanType(),
    "string": StringType(),
}


def decode_bound(col: Column, type_name: str) -> Column:
    """Column of Iceberg bound bytes -> typed column (vectorized Pandas UDF).

    ``type_name`` must be constant per call — callers decode after joining
    the schema dimension and filtering to one primitive type (the reference
    skips non-primitive fields the same way, formatters.py:585-586).
    """
    out_type = _SPARK_TYPE[type_name]  # KeyError = unsupported, fail fast

    @F.pandas_udf(out_type)
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: decode_bound_bytes(b, type_name))

    return _decode(col)
