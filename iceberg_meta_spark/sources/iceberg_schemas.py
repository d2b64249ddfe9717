"""Iceberg v2 Avro schemas + single-value serialization, from the spec.

The manifest-entry / manifest-file Avro schemas below are transcribed from
the public Apache Iceberg table spec (iceberg.apache.org/spec, Appendix C:
Avro schemas), trimmed to required fields + the optional stats fields this
repo populates; spec field-ids are kept as documentation. Shared by the
fixture writer (sources/iceberg_fixture.py) and the commit path
(sources/iceberg_write.py).
"""

from __future__ import annotations

import struct


_KV_LONG = {
    "type": "array",
    "logicalType": "map",
    "items": {
        "type": "record",
        "name": "k_v_long",
        "fields": [
            {"name": "key", "type": "int", "field-id": 117},
            {"name": "value", "type": "long", "field-id": 118},
        ],
    },
}

_KV_BYTES = {
    "type": "array",
    "logicalType": "map",
    "items": {
        "type": "record",
        "name": "k_v_bytes",
        "fields": [
            {"name": "key", "type": "int", "field-id": 126},
            {"name": "value", "type": "bytes", "field-id": 127},
        ],
    },
}


def manifest_entry_schema(
    partition_fields: list[dict], with_first_row_id: bool = False
) -> dict:
    """v2 manifest_entry record (spec § Manifests / Appendix C).
    ``with_first_row_id`` adds the v3 row-lineage field (``first_row_id``,
    field-id 142) to the data_file record — v3 writers stamp each added
    data file's starting ``_row_id``; v2 manifests must not carry it."""
    schema = _manifest_entry_schema_v2(partition_fields)
    if with_first_row_id:
        df_fields = schema["fields"][-1]["type"]["fields"]
        df_fields.append(
            {"name": "first_row_id", "type": ["null", "long"],
             "default": None, "field-id": 142}
        )
    return schema


def _manifest_entry_schema_v2(partition_fields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": partition_fields,
                            },
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {"name": "column_sizes", "type": ["null", _KV_LONG], "default": None, "field-id": 108},
                        {"name": "value_counts", "type": ["null", _KV_LONG], "default": None, "field-id": 109},
                        {"name": "null_value_counts", "type": ["null", _KV_LONG], "default": None, "field-id": 110},
                        {"name": "lower_bounds", "type": ["null", _KV_BYTES], "default": None, "field-id": 125},
                        {"name": "upper_bounds", "type": ["null", _KV_BYTES], "default": None, "field-id": 128},
                        {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": None, "field-id": 132},
                        {"name": "sort_order_id", "type": ["null", "int"], "default": None, "field-id": 140},
                    ],
                },
            },
        ],
    }


MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "field-id": 507,
            "default": None,
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean", "field-id": 509},
                            {"name": "contains_nan", "type": ["null", "boolean"], "default": None, "field-id": 518},
                            {"name": "lower_bound", "type": ["null", "bytes"], "default": None, "field-id": 510},
                            {"name": "upper_bound", "type": ["null", "bytes"], "default": None, "field-id": 511},
                        ],
                    },
                },
            ],
        },
    ],
}


def _le_long(n: int) -> bytes:
    """Spec Appendix D: long bounds serialize little-endian, 8 bytes."""
    return struct.pack("<q", n)
