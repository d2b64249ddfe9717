"""Python UDTF surface (SURVEY §2.10): table-valued functions with LATERAL.

The engine's standing rule is that Python stays OFF the hot path — every
per-row transformation ships as a codegen'd Column expression, and the one
sanctioned Python boundary is the Arrow-batched multimodal decode
(pipeline/multimodal.py). This module completes the UDF/UDAF/UDTF API
triangle with the TABLE-function corner: a PySpark ``@udtf`` is the right
tool when one input row expands into a VARIABLE-length row set whose
generation needs imperative logic (a parser with error recovery, a
tokenizer with carry-over state per call) — the case where an expression
``explode`` would first have to build the whole array in memory.

``parse_props`` is the reference instance: the same key/value extraction
``events_props_extract`` does with JSON-path expressions (the hot path,
and the ORACLE for parity in tests), restated as a lateral table function
with malformed-row recovery — bad JSON yields a (NULL, NULL, error) row
instead of failing the task, the tolerance a crawl-scale parser needs.

Scale: a UDTF runs row-at-a-time in Python workers — fine for control-rate
inputs (config expansion, DDL generation, error-tolerant sidecar parses),
wrong for the per-document hot path; the docstring contract mirrors
SURVEY §2.10's "UDFs are the slow path" rule.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key string, value long, error string")
class parse_props:  # noqa: N801 — registered lowercase as a SQL function
    """LATERAL-joinable key/value expansion of a JSON props string with
    per-row error recovery."""

    def eval(self, props: str):  # noqa: D102
        if props is None:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError) as e:
            yield None, None, type(e).__name__
            return
        if not isinstance(obj, dict):
            yield None, None, "NotAnObject"
            return
        for k in sorted(obj):
            v = obj[k]
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                yield k, None, "NonNumericValue"
            else:
                yield k, int(v), None


def register_table_functions(spark) -> None:
    """Register every UDTF under its SQL name (idempotent per session)."""
    spark.udtf.register("parse_props", parse_props)
