"""Puffin statistics files, jar-free (iceberg.apache.org/puffin-spec).

Puffin is Iceberg's container format for table-level statistics blobs —
the file an engine's ANALYZE TABLE writes and a planner's cost model
reads (NDV per column, sketches). The reference never touches statistics
(pyiceberg delegates planning to the engine); this module implements the
container itself so the native path can round-trip stats:

    Magic  Blob₁ … Blobₙ  Magic FooterPayload FooterPayloadSize Flags Magic

- ``Magic`` = 4 bytes ``PFA1`` (0x50 0x46 0x41 0x31), at file start and
  bracketing the footer.
- ``FooterPayload`` = UTF-8 JSON ``{"blobs": [BlobMetadata...],
  "properties": {...}}``; each BlobMetadata records type, fields
  (column ids), snapshot-id, sequence-number, offset, length and
  free-form properties.
- ``FooterPayloadSize`` = 4-byte LE int; ``Flags`` = 4 bytes (bit 0 of
  byte 0 = payload lz4-compressed — this writer always 0; the reader
  rejects compressed payloads explicitly rather than mis-parsing).

Blob payloads: the standard NDV blob type is
``apache-datasketches-theta-v1`` whose payload is a serialized theta
sketch — faithfully producing that byte format needs the datasketches
library (not in this container), so ANALYZE here writes the documented
custom type ``ndv-long-v1`` (8-byte LE count) and ALSO sets the ``ndv``
blob PROPERTY, which is where engines (e.g. Trino's Iceberg connector)
read the estimate from — the property, not the sketch bytes, drives
planning. A reader encountering a real theta blob still gets its
metadata + raw payload back.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"


def write_puffin(
    path: str,
    blobs: list[dict],
    file_properties: dict[str, str] | None = None,
) -> dict:
    """Write a Puffin file; each blob dict carries ``type``, ``fields``
    (list of column ids), ``snapshot_id``, ``sequence_number``,
    ``payload`` (bytes) and optional ``properties``. Returns
    {file_size_in_bytes, file_footer_size_in_bytes, blob_metadata} —
    exactly what the table metadata's ``statistics`` entry records."""
    body = bytearray(MAGIC)
    blob_meta = []
    for b in blobs:
        payload = bytes(b["payload"])
        blob_meta.append({
            "type": b["type"],
            "fields": [int(f) for f in b["fields"]],
            "snapshot-id": int(b["snapshot_id"]),
            "sequence-number": int(b["sequence_number"]),
            "offset": len(body),
            "length": len(payload),
            **({"properties": b["properties"]} if b.get("properties") else {}),
        })
        body += payload
    payload_json = json.dumps(
        {"blobs": blob_meta, "properties": file_properties or {}},
        sort_keys=True,
    ).encode("utf-8")
    footer = MAGIC + payload_json + struct.pack("<i", len(payload_json)) \
        + b"\x00\x00\x00\x00" + MAGIC
    with open(path, "wb") as fh:
        fh.write(bytes(body) + footer)
    return {
        "file_size_in_bytes": len(body) + len(footer),
        "file_footer_size_in_bytes": len(footer),
        "blob_metadata": blob_meta,
    }


def read_puffin(path: str) -> dict:
    """Parse a Puffin file -> {"blobs": [{...metadata, "payload": bytes}],
    "properties": {...}}. Validates all three magics and the flag bytes."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file (bad magic): {path}")
    flags = data[-8:-4]
    if flags[0] & 1:
        raise ValueError("compressed Puffin footer payloads not supported")
    (payload_size,) = struct.unpack("<i", data[-12:-8])
    payload_end = len(data) - 12
    payload = data[payload_end - payload_size:payload_end]
    if data[payload_end - payload_size - 4:payload_end - payload_size] != MAGIC:
        raise ValueError(f"corrupt Puffin footer (bad inner magic): {path}")
    footer = json.loads(payload.decode("utf-8"))
    blobs = []
    for bm in footer.get("blobs", []):
        off, ln = int(bm["offset"]), int(bm["length"])
        blobs.append({**bm, "payload": data[off:off + ln]})
    return {"blobs": blobs, "properties": footer.get("properties", {})}
