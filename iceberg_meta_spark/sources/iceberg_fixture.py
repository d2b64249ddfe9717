"""Write a real (spec-conformant) Iceberg v2 metadata tree for tests.

``write_fixture_table`` materializes the full metadata side of an Iceberg
table — ``vN.metadata.json`` + ``version-hint.text``, one manifest-list
Avro per snapshot, and per-snapshot manifest Avro files — using the public
table spec's v2 schemas (iceberg.apache.org/spec §§ Table Metadata,
Manifest Lists, Manifests, Appendix C Avro schemas) and the pure-Python
Avro writer in ``sources/avro_py.py``. Data files are metadata-only
(paths need not exist): every reader under test consumes the metadata
tree, same as the reference's analytics (it never opens data parquet).

Everything is deterministic (fixed sync marker, arithmetic-derived sizes
and counts) so tests can pin exact expectations, and the writer is
independent of the reader module — round-trip tests exercise two separately
written codec paths plus golden-byte pins against spec examples.
"""

from __future__ import annotations

import json
import os

from iceberg_meta_spark.sources.avro_py import write_container
from iceberg_meta_spark.sources.iceberg_schemas import (
    MANIFEST_FILE_SCHEMA,
    _le_long,
    manifest_entry_schema,
)

_FIELDS = (  # (field-id, name, type) of the fixture table's schema
    (1, "region", "string"),
    (2, "user_id", "long"),
    (3, "value_cents", "long"),
    (4, "payload", "string"),
)


def write_fixture_table(
    base_dir: str,
    n_snapshots: int = 3,
    manifests_per_snapshot: int = 2,
    files_per_manifest: int = 25,
    delete_files_last_snapshot: int = 0,
    evolve_schema: bool = False,
) -> str:
    """Write a deterministic Iceberg v2 table at ``base_dir/fixture_table``.

    Shape: snapshot s (1-based) appends ``manifests_per_snapshot`` new
    manifests; its manifest list carries every manifest up to s, so snapshot
    s sees ``s * manifests_per_snapshot * files_per_manifest`` live files.
    Partitioned by identity(region) over 4 regions; per-file record counts /
    sizes / column stats are closed-form in the file index so tests can pin
    exact aggregates. ``delete_files_last_snapshot`` > 0 additionally gives
    the FINAL snapshot one delete manifest (content=1) carrying that many
    position-delete files (spec § Manifests: delete manifests; content=1
    data_file entries) — the v2 row-level-delete shape the A2/P5 kernels
    audit. Returns the table directory."""
    table_dir = os.path.join(base_dir, "fixture_table")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    partition_fields = [
        {"name": "region", "type": ["null", "string"], "default": None, "field-id": 1000}
    ]
    entry_schema = manifest_entry_schema(partition_fields)
    regions = ("americas", "emea", "apac", "latam")

    manifest_records: list[dict] = []  # manifest_file rows, cumulative
    snapshots_json: list[dict] = []
    running_rows = 0   # real cumulative totals: the summary keys feed the
    running_bytes = 0  # S1/S3 warehouse rollups, so "0" placeholders would
    # make every natively-read fixture table report zero records/bytes

    for s in range(1, n_snapshots + 1):
        added_rows = 0
        added_bytes = 0
        for m in range(manifests_per_snapshot):
            m_idx = (s - 1) * manifests_per_snapshot + m
            entries = []
            for f in range(files_per_manifest):
                f_idx = m_idx * files_per_manifest + f
                region = regions[f_idx % len(regions)]
                record_count = 100 + (f_idx % 7) * 50
                file_size = (1 + f_idx % 9) * 8 * 1024 * 1024
                added_rows += record_count
                added_bytes += file_size
                entries.append(
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": s,
                        "sequence_number": s,
                        "file_sequence_number": s,
                        "data_file": {
                            "content": 0,
                            "file_path": f"{table_dir}/data/{region}/f{f_idx:05d}.parquet",
                            "file_format": "PARQUET",
                            "partition": {"region": region},
                            "record_count": record_count,
                            "file_size_in_bytes": file_size,
                            "column_sizes": [
                                {"key": fid, "value": file_size // (4 * (fid + 1))}
                                for fid, _, _ in _FIELDS
                            ],
                            "value_counts": [
                                {"key": fid, "value": record_count} for fid, _, _ in _FIELDS
                            ],
                            "null_value_counts": [
                                {"key": fid, "value": (f_idx + fid) % 5} for fid, _, _ in _FIELDS
                            ],
                            "lower_bounds": [
                                {"key": 2, "value": _le_long(f_idx * 1000)},
                                {"key": 3, "value": _le_long(f_idx * 10)},
                            ],
                            "upper_bounds": [
                                {"key": 2, "value": _le_long(f_idx * 1000 + 2500)},
                                {"key": 3, "value": _le_long(f_idx * 10 + 5000)},
                            ],
                            "split_offsets": [4],
                            "sort_order_id": 0,
                        },
                    }
                )
            manifest_path = os.path.join(meta_dir, f"manifest-{m_idx:04d}.avro")
            blob = write_container(
                entry_schema,
                entries,
                metadata={
                    "format-version": b"2",
                    "content": b"data",
                    "partition-spec-id": b"0",
                },
            )
            with open(manifest_path, "wb") as fh:
                fh.write(blob)
            manifest_records.append(
                {
                    "manifest_path": manifest_path,
                    "manifest_length": len(blob),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": s,
                    "min_sequence_number": s,
                    "added_snapshot_id": s,
                    "added_files_count": files_per_manifest,
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(
                        e["data_file"]["record_count"] for e in entries
                    ),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "partitions": [
                        {
                            "contains_null": False,
                            "contains_nan": False,
                            "lower_bound": min(
                                e["data_file"]["partition"]["region"] for e in entries
                            ).encode(),
                            "upper_bound": max(
                                e["data_file"]["partition"]["region"] for e in entries
                            ).encode(),
                        }
                    ],
                }
            )
        if s == n_snapshots and delete_files_last_snapshot > 0:
            del_entries = [
                {
                    "status": 1,
                    "snapshot_id": s,
                    "sequence_number": s,
                    "file_sequence_number": s,
                    "data_file": {
                        "content": 1,  # POSITION_DELETES
                        "file_path": f"{table_dir}/data/deletes/d{di:04d}.parquet",
                        "file_format": "PARQUET",
                        "partition": {"region": regions[di % len(regions)]},
                        "record_count": 10 * (di + 1),
                        "file_size_in_bytes": 4096 * (di + 1),
                        "column_sizes": None,
                        "value_counts": None,
                        "null_value_counts": None,
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "split_offsets": None,
                        "sort_order_id": None,
                    },
                }
                for di in range(delete_files_last_snapshot)
            ]
            del_path = os.path.join(meta_dir, "manifest-deletes.avro")
            del_blob = write_container(
                entry_schema,
                del_entries,
                metadata={
                    "format-version": b"2",
                    "content": b"deletes",
                    "partition-spec-id": b"0",
                },
            )
            with open(del_path, "wb") as fh:
                fh.write(del_blob)
            manifest_records.append(
                {
                    "manifest_path": del_path,
                    "manifest_length": len(del_blob),
                    "partition_spec_id": 0,
                    "content": 1,  # delete manifest
                    "sequence_number": s,
                    "min_sequence_number": s,
                    "added_snapshot_id": s,
                    "added_files_count": delete_files_last_snapshot,
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(
                        e["data_file"]["record_count"] for e in del_entries
                    ),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "partitions": None,
                }
            )
        mlist_path = os.path.join(meta_dir, f"snap-{s}-manifest-list.avro")
        with open(mlist_path, "wb") as fh:
            fh.write(
                write_container(
                    MANIFEST_FILE_SCHEMA,
                    list(manifest_records),
                    metadata={"format-version": b"2"},
                )
            )
        total_files = s * manifests_per_snapshot * files_per_manifest
        running_rows += added_rows
        running_bytes += added_bytes
        snapshots_json.append(
            {
                "snapshot-id": s,
                **({"parent-snapshot-id": s - 1} if s > 1 else {}),
                "sequence-number": s,
                "timestamp-ms": 1713139200000 + s * 60_000,
                "manifest-list": mlist_path,
                "schema-id": 0,
                "summary": {
                    "operation": "append",
                    "added-records": str(added_rows),
                    "deleted-records": "0",
                    "total-data-files": str(total_files),
                    "total-records": str(running_rows),
                    "total-files-size": str(running_bytes),
                },
            }
        )

    def _metadata_at(version: int) -> dict:
        """Table metadata as of commit ``version`` (snapshot `version` is
        current; later snapshots absent) — every commit leaves its
        vN.metadata.json behind, per spec § Metadata Log, exactly like the
        native writer (iceberg_write.py) does on real commits."""
        return {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000beef",
        "location": table_dir,
        "last-sequence-number": version,
        "last-updated-ms": 1713139200000 + version * 60_000,
        "last-column-id": 5 if evolve_schema else _FIELDS[-1][0],
        "current-schema-id": 1 if evolve_schema else 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": fid, "name": name, "required": fid <= 2, "type": typ}
                    for fid, name, typ in _FIELDS
                ],
            }
        ]
        + (
            [
                {
                    "type": "struct",
                    "schema-id": 1,
                    # spec § Schema Evolution: add a column (new field id),
                    # widen int->long is NOT shown here — the evolved schema
                    # drops 'payload' and adds 'score'
                    "fields": [
                        {"id": fid, "name": name, "required": fid <= 2, "type": typ}
                        for fid, name, typ in _FIELDS
                        if name != "payload"
                    ]
                    + [{"id": 5, "name": "score", "required": False, "type": "double"}],
                }
            ]
            if evolve_schema
            else []
        ),
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "region", "transform": "identity", "source-id": 1, "field-id": 1000}
                ],
            }
        ],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": version,
        "refs": {
            "main": {"snapshot-id": version, "type": "branch"},
            "audit-base": {"snapshot-id": 1, "type": "tag",
                           "max-ref-age-ms": 31536000000},
        },
        "snapshots": snapshots_json[:version],
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots_json[:version]
        ],
        "metadata-log": [
            {"metadata-file": f"{meta_dir}/v{k}.metadata.json",
             "timestamp-ms": 1713139200000 + k * 60_000}
            for k in range(1, version)
        ],
    }

    for version in range(1, n_snapshots + 1):
        with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
            json.dump(_metadata_at(version), fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(n_snapshots))
    return table_dir


def default_fixture_table() -> str:
    """Materialize the default (3 snapshots x 2 manifests x 25 files)
    fixture table ONCE under the system tmp dir and return its path.

    Registered queries (iceberg_native_file_health / _partition_distribution)
    read through this so the jar-free native path sits under the driver's
    hash gate; content is fully deterministic, so rebuilds are idempotent.
    A completion marker (written last) guards against a half-written tree."""
    import tempfile

    # _v3: the r8 fixture writes one vN.metadata.json per commit (metadata
    # log + version time travel); the new suffix invalidates any _v1 tree
    # cached by an earlier round.
    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_v3")
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        table = write_fixture_table(base)
        with open(marker, "w") as fh:
            fh.write("ok")
        return table
    return os.path.join(base, "fixture_table")


def default_fixture_table_with_deletes() -> str:
    """Like :func:`default_fixture_table`, but the final snapshot carries a
    delete manifest with 6 position-delete files (di = 0..5: record_count
    10·(di+1), size 4096·(di+1), region = regions[di % 4]) — the fixture
    behind the registered native row-level-delete audit query."""
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_del_v3")
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        table = write_fixture_table(base, delete_files_last_snapshot=6)
        with open(marker, "w") as fh:
            fh.write("ok")
        return table
    return os.path.join(base, "fixture_table")


def default_fixture_table_with_orphans() -> str:
    """Like :func:`default_fixture_table`, plus three PLANTED orphan files
    no metadata version references — deterministic names/sizes so the
    registered orphan-scan query has a closed-form oracle:
    data/americas/orphan-000.bin (100 B), data/emea/orphan-001.bin (200 B),
    metadata/stray-manifest.avro (300 B)."""
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_orph_v3")
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        table = write_fixture_table(base)
        for rel, size in (
            ("data/americas/orphan-000.bin", 100),
            ("data/emea/orphan-001.bin", 200),
            ("metadata/stray-manifest.avro", 300),
        ):
            path = os.path.join(table, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as fh:
                fh.write(b"\x00" * size)
        with open(marker, "w") as fh:
            fh.write("ok")
        return table
    return os.path.join(base, "fixture_table")


def default_mor_table(spark) -> str:
    """A REAL merge-on-read table: actual parquet data files + a native
    metadata tree committed over them, with both v2 delete shapes.

    4 commits: (1) append batch1 = ids 0..9 (val = 10·id, region by id%3),
    (2) append batch2 = ids 10..19, (3) position deletes (batch1 pos 0 and
    3 → ids 0, 3; batch2 pos 5 → id 15), (4) equality deletes on id ∈
    {7, 12}. A full MoR scan therefore yields ids 0..19 minus
    {0, 3, 15, 7, 12} — 15 rows, closed-form for the oracle (which reads
    the SAME parquet with file_row_number and applies the same deletes in
    SQL). Data file bounds are committed per Appendix D, so the zone-map
    pruning path has real intervals (batch1 id∈[0,9], batch2 id∈[10,19])."""
    import glob
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        commit_delete_files,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_mor_v1")
    table = os.path.join(base, "mor_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table

    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "region", "string"), (3, "val", "long")],
    )

    def write_batch(name: str, ids: range) -> str:
        rows = [(i, regions[i % 3], i * 10) for i in ids]
        (spark.createDataFrame(rows, "id long, region string, val long")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(table, "data", name)))
        [path] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        return path

    p1 = write_batch("batch1", range(0, 10))
    commit_append(table, [{
        "file_path": p1, "record_count": 10,
        "file_size_in_bytes": os.path.getsize(p1),
        "value_counts": {1: 10}, "null_value_counts": {1: 0},
        "column_sizes": {1: os.path.getsize(p1)},
        "lower_bounds": {1: 0}, "upper_bounds": {1: 9},
    }], timestamp_ms=1713139200000 + 60_000)
    p2 = write_batch("batch2", range(10, 20))
    commit_append(table, [{
        "file_path": p2, "record_count": 10,
        "file_size_in_bytes": os.path.getsize(p2),
        "value_counts": {1: 10}, "null_value_counts": {1: 0},
        "column_sizes": {1: os.path.getsize(p2)},
        "lower_bounds": {1: 10}, "upper_bounds": {1: 19},
    }], timestamp_ms=1713139200000 + 120_000)

    # position delete file (spec: columns file_path, pos)
    pos_rows = [(p1, 0), (p1, 3), (p2, 5)]
    (spark.createDataFrame(pos_rows, "file_path string, pos long")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(table, "data", "deletes_pos")))
    [dp] = glob.glob(os.path.join(table, "data", "deletes_pos", "*.parquet"))
    commit_delete_files(table, [{
        "file_path": dp, "record_count": 3,
        "file_size_in_bytes": os.path.getsize(dp),
    }], timestamp_ms=1713139200000 + 180_000)

    # equality delete file on field id=1
    (spark.createDataFrame([(7,), (12,)], "id long")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(table, "data", "deletes_eq")))
    [de] = glob.glob(os.path.join(table, "data", "deletes_eq", "*.parquet"))
    commit_delete_files(table, [{
        "file_path": de, "record_count": 2,
        "file_size_in_bytes": os.path.getsize(de),
        "equality_ids": [1],
    }], timestamp_ms=1713139200000 + 240_000)

    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_partitioned_table(spark) -> str:
    """An identity-partitioned (region) table inserted via
    ``append_dataframe``: Hive-layout data files, partition tuples recorded
    per file in the manifest. 9 rows over 3 regions, id = 1..9, val =
    100·id — closed-form for the oracle (DuckDB reads the same files with
    hive_partitioning)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_part_v1")
    table = os.path.join(base, "part_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long"), (3, "val", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    rows = [(regions[i % 3], i, i * 100) for i in range(1, 10)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "region string, id long, val long")
        .repartition(1),
        table,
        timestamp_ms=1713139200000 + 60_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_compaction_table(spark) -> str:
    """A small-file table COMPACTED by ``rewrite_data_files``: 4 append
    commits (ids 0..19, region = regions[i % 3], val = 10·id, one file
    each), an equality delete on id ∈ {3, 12}, then the rewrite — so the
    final state is ONE data file holding the 18 surviving rows at the
    replace snapshot's sequence number, with the (now dangling) delete
    file still committed. Closed form for the oracle: data_files=1,
    row_count=18, sum_val=10·(190−15)=1750, snapshots=6,
    live_delete_files=1."""
    import glob
    import tempfile

    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        commit_delete_files,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_compact_v1")
    table = os.path.join(base, "compact_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "region", "string"), (3, "val", "long")],
    )
    for b in range(4):
        rows = [(i, regions[i % 3], i * 10) for i in range(b * 5, b * 5 + 5)]
        append_dataframe(
            spark,
            spark.createDataFrame(rows, "id long, region string, val long")
            .coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (b + 1),
        )
    (spark.createDataFrame([(3,), (12,)], "id long").coalesce(1)
     .write.parquet(os.path.join(table, "data", "del_eq")))
    [de] = glob.glob(os.path.join(table, "data", "del_eq", "*.parquet"))
    commit_delete_files(table, [{
        "file_path": de, "record_count": 2,
        "file_size_in_bytes": os.path.getsize(de), "equality_ids": [1],
    }], timestamp_ms=1713139200000 + 300_000)
    out = rewrite_data_files(spark, table, timestamp_ms=1713139200000 + 360_000)
    assert out["groups"] == 1 and out["added_files"] == 1, out
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_changelog_table(spark) -> str:
    """A 4-commit history for the native changelog read: (1) append ids
    0..9, (2) append ids 10..19, (3) ONE delete commit carrying a position
    delete (batch1 pos 2 -> id 2) AND an equality delete (id 15), (4)
    append ids 20..24. val = 10·id, region = regions[id % 3] throughout.
    Changes from snapshot 2 to current: inserts = ids 20..24, deletes =
    {2, 15} — closed form for the oracle."""
    import glob
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        commit_delete_files,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_cdc_v1")
    table = os.path.join(base, "cdc_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "region", "string"), (3, "val", "long")],
    )

    def write_batch(name: str, ids: range) -> str:
        rows = [(i, regions[i % 3], i * 10) for i in ids]
        (spark.createDataFrame(rows, "id long, region string, val long")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(table, "data", name)))
        [path] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        return path

    for bi, ids in enumerate((range(0, 10), range(10, 20))):
        p = write_batch(f"batch{bi + 1}", ids)
        commit_append(table, [{
            "file_path": p, "record_count": 10,
            "file_size_in_bytes": os.path.getsize(p),
            "lower_bounds": {1: ids.start}, "upper_bounds": {1: ids.stop - 1},
            "value_counts": {1: 10}, "null_value_counts": {1: 0},
            "column_sizes": {1: os.path.getsize(p)},
        }], timestamp_ms=1713139200000 + 60_000 * (bi + 1))

    p1 = glob.glob(os.path.join(table, "data", "batch1", "*.parquet"))[0]
    (spark.createDataFrame([(p1, 2)], "file_path string, pos long")
     .coalesce(1).write.parquet(os.path.join(table, "data", "del_pos")))
    [dp] = glob.glob(os.path.join(table, "data", "del_pos", "*.parquet"))
    (spark.createDataFrame([(15,)], "id long")
     .coalesce(1).write.parquet(os.path.join(table, "data", "del_eq")))
    [de] = glob.glob(os.path.join(table, "data", "del_eq", "*.parquet"))
    commit_delete_files(table, [
        {"file_path": dp, "record_count": 1,
         "file_size_in_bytes": os.path.getsize(dp)},
        {"file_path": de, "record_count": 1,
         "file_size_in_bytes": os.path.getsize(de), "equality_ids": [1]},
    ], timestamp_ms=1713139200000 + 180_000)

    p3 = write_batch("batch3", range(20, 25))
    commit_append(table, [{
        "file_path": p3, "record_count": 5,
        "file_size_in_bytes": os.path.getsize(p3),
        "lower_bounds": {1: 20}, "upper_bounds": {1: 24},
        "value_counts": {1: 5}, "null_value_counts": {1: 0},
        "column_sizes": {1: os.path.getsize(p3)},
    }], timestamp_ms=1713139200000 + 240_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_merge_table(spark) -> str:
    """An upsert history for the merge query: append ids 0..9 (val =
    10·id), then MERGE a batch of ids 5..12 with val = 1000 + 10·id keyed
    on id — ids 0..4 stay, 5..9 update, 10..12 insert. Closed form for
    the oracle: val = 10·id for id < 5, 1000 + 10·id for 5 <= id <= 12."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        merge_into,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_merge_v1")
    table = os.path.join(base, "merge_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "region", "string"), (3, "val", "long")],
    )
    rows = [(i, regions[i % 3], i * 10) for i in range(10)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "id long, region string, val long")
        .coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    upserts = [(i, regions[i % 3], 1000 + i * 10) for i in range(5, 13)]
    merge_into(
        spark,
        spark.createDataFrame(upserts, "id long, region string, val long")
        .coalesce(1),
        table, key_cols=["id"], timestamp_ms=1713139200000 + 120_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_delete_where_table(spark) -> str:
    """A table DELETEd by predicate: append ids 0..9 and 10..19 (val =
    10·id), then ``delete_where(id BETWEEN 5 AND 14)`` — the matching rows
    resolve to (file, pos) through the scan and publish as one
    position-delete commit. Closed form: surviving ids 0..4 ∪ 15..19."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_dw_v1")
    table = os.path.join(base, "dw_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for bi, ids in enumerate((range(0, 10), range(10, 20))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10) for i in ids],
                                  "id long, val long").coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (bi + 1),
        )
    out = delete_where(spark, table, ("id", 5, 14),
                       timestamp_ms=1713139200000 + 180_000)
    assert out["rows_deleted"] == 10, out
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_posdel_rewrite_table(spark) -> str:
    """A table after ``rewrite_position_deletes``: b1 = ids 0..9 and b2 =
    ids 10..19 (val = 10·id); position-delete file A targets only b1
    (pos 0, 3), file B targets b1 (pos 5) AND b2 (pos 2 -> id 12); the b1
    FILE is then removed, making A fully dangling and B partially; the
    rewrite drops A and shrinks B to its one live row. Closed form: 1
    position-delete file, served ids 10..19 minus {12}."""
    import glob
    import tempfile

    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_position_deletes,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        commit_delete_files,
        commit_remove_files,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_pdr_v1")
    table = os.path.join(base, "pdr_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])

    def batch(name, ids):
        (spark.createDataFrame([(i, i * 10) for i in ids], "id long, val long")
         .coalesce(1).write.parquet(os.path.join(table, "data", name)))
        [p] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        return p

    p1 = batch("b1", range(0, 10))
    commit_append(table, [{"file_path": p1, "record_count": 10,
                           "file_size_in_bytes": os.path.getsize(p1)}],
                  timestamp_ms=1713139200000 + 60_000)
    p2 = batch("b2", range(10, 20))
    commit_append(table, [{"file_path": p2, "record_count": 10,
                           "file_size_in_bytes": os.path.getsize(p2)}],
                  timestamp_ms=1713139200000 + 120_000)
    for name, rows, ts in (
        ("del_a", [(p1, 0), (p1, 3)], 180_000),
        ("del_b", [(p1, 5), (p2, 2)], 240_000),
    ):
        (spark.createDataFrame(rows, "file_path string, pos long")
         .coalesce(1).write.parquet(os.path.join(table, "data", name)))
        [dp] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        commit_delete_files(table, [{
            "file_path": dp, "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(dp),
        }], timestamp_ms=1713139200000 + ts)
    commit_remove_files(table, {p1}, timestamp_ms=1713139200000 + 300_000)
    res = rewrite_position_deletes(spark, table,
                                   timestamp_ms=1713139200000 + 360_000)
    assert res["dropped"] == 1 and res["rewritten"] == 1, res
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_bucket_table(spark) -> str:
    """A ``bucket[4]``-partitioned table (spec § Partition Transforms):
    ids 1..40, val = 7·id, inserted via ``append_dataframe`` under the
    spec field ``id_bucket = bucket[4](id)`` — murmur3 seed-0 hashing lays
    the rows out across 4 Hive dirs (all four non-empty for this id range;
    bucket_value(17, long, 4) = 3). Closed form for the oracle: a point
    predicate id = 17 projects to exactly one bucket, so files_total = 4,
    files_pruned = 3, and one row (17, 119) survives the residual filter."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_bucket_v1")
    table = os.path.join(base, "bucket_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "val", "long")],
        partition_fields=[("id_bucket", 1, 1000, "bucket[4]")],
    )
    rows = [(i, i * 7) for i in range(1, 41)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "id long, val long").repartition(1),
        table,
        timestamp_ms=1713139200000 + 60_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_temporal_table(spark) -> str:
    """A ``month``-partitioned table: 24 rows, two per month of 2024
    (event_date = the 5th and the 20th), id 1..24, val = 10·id, under the
    spec field ``event_month = month(event_date)`` (months-from-1970
    ordinals 648..659 — 12 Hive dirs, one data file each). Closed form:
    the predicate event_date ∈ [2024-03-10, 2024-05-20] projects to
    ordinals [650, 652], so files_total = 12, files_pruned = 9, and the
    residual filter keeps Mar-20, Apr-5, Apr-20, May-5, May-20 (5 rows)."""
    import datetime
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_temporal_v1"
    )
    table = os.path.join(base, "temporal_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "event_date", "date"), (2, "id", "long"), (3, "val", "long")],
        partition_fields=[("event_month", 1, 1000, "month")],
    )
    rows = [
        (datetime.date(2024, m, d), (m - 1) * 2 + (1 if d == 5 else 2),
         ((m - 1) * 2 + (1 if d == 5 else 2)) * 10)
        for m in range(1, 13)
        for d in (5, 20)
    ]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "event_date date, id long, val long")
        .repartition(1),
        table,
        timestamp_ms=1713139200000 + 60_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_truncate_table(spark) -> str:
    """A ``truncate[10]``-partitioned table: ids 0..39, val = 3·id, under
    the spec field ``id_trunc = truncate[10](id)`` (floor-to-multiple —
    dirs 0/10/20/30, one file each). Closed form: the predicate
    id ∈ [13, 27] projects to truncated endpoints [10, 20], so
    files_total = 4, files_pruned = 2, and ids 13..27 survive (15 rows)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_trunc_v1"
    )
    table = os.path.join(base, "trunc_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "val", "long")],
        partition_fields=[("id_trunc", 1, 1000, "truncate[10]")],
    )
    rows = [(i, i * 3) for i in range(0, 40)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "id long, val long").repartition(1),
        table,
        timestamp_ms=1713139200000 + 60_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_stats_table(spark) -> str:
    """An ANALYZEd table with pending row-level deletes, proving NDV is
    merge-on-read correct: 9 rows (region = regions[i % 3], id = 1..9,
    val = 100·id), DELETE WHERE id ∈ [4, 5], then exact ANALYZE. Closed
    form: served ids {1,2,3,6,7,8,9} -> ndv(region)=3, ndv(id)=7,
    ndv(val)=7, statistics snapshot = 2 (append, then delete)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_stats import analyze_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_stats_v1")
    table = os.path.join(base, "stats_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    regions = ("americas", "emea", "apac")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long"), (3, "val", "long")],
    )
    rows = [(regions[i % 3], i, i * 100) for i in range(1, 10)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "region string, id long, val long")
        .coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    delete_where(spark, table, ("id", 4, 5),
                 timestamp_ms=1713139200000 + 120_000)
    analyze_table(spark, table, exact=True,
                  timestamp_ms=1713139200000 + 180_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_wap_table(spark) -> str:
    """A write-audit-publish table: main append (ids 1..5, val = 10·id),
    a STAGED audit-branch append (ids 6..10) — invisible to main readers —
    then ``fast_forward("main", "audit")`` publishes. Metadata versions:
    v1 create, v2 main append, v3 staged branch append, v4 publish.
    Closed form: post-publish scan = 10 rows / sum_val 550; the v3 time
    travel still serves the pre-publish 5 rows; ref=audit serves all 10."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        fast_forward,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_wap_v1")
    table = os.path.join(base, "wap_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long"), (3, "val", "long")],
    )
    regions = ("americas", "emea", "apac")
    append_dataframe(
        spark,
        spark.createDataFrame(
            [(regions[i % 3], i, i * 10) for i in range(1, 6)],
            "region string, id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    append_dataframe(
        spark,
        spark.createDataFrame(
            [(regions[i % 3], i, i * 10) for i in range(6, 11)],
            "region string, id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 120_000, branch="audit",
    )
    fast_forward(table, "main", "audit",
                 timestamp_ms=1713139200000 + 180_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_string_bounds_table(spark) -> str:
    """A table whose zone-map pruning runs on a STRING column (no
    partitioning): three appends, one region per file ('americas' ids
    0..4, 'emea' ids 5..9, 'apac' ids 10..14, val = 10·id). The writer
    records Appendix-D string bounds, so predicate region = 'emea' prunes
    both other files ([min,max] disjoint). Closed form: files_total = 3,
    files_pruned = 2, 5 rows, sum_val = 10·(5+..+9) = 350."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_strb_v1")
    table = os.path.join(base, "strb_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long"), (3, "val", "long")],
    )
    for b, region in enumerate(("americas", "emea", "apac")):
        rows = [(region, b * 5 + i, (b * 5 + i) * 10) for i in range(5)]
        append_dataframe(
            spark,
            spark.createDataFrame(rows, "region string, id long, val long")
            .coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (b + 1),
        )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_rollback_table(spark) -> str:
    """A rolled-back table for the ``history`` metadata-table gate: three
    appends (snap 1/2/3 at minutes 1/2/3), then rollback to snap 2 at
    minute 4. The snapshot log has FOUR entries (the rollback re-logs
    snap 2); snap 3 is live-but-abandoned (not a current ancestor)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        rollback_to_snapshot,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_rb_v1")
    table = os.path.join(base, "rb_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(3):
        rows = [(b * 3 + i, (b * 3 + i) * 10) for i in range(3)]
        append_dataframe(
            spark,
            spark.createDataFrame(rows, "id long, val long").coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (b + 1),
        )
    rollback_to_snapshot(table, 2, timestamp_ms=1713139200000 + 240_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_stream_sink_table(spark) -> str:
    """A native table GROWN BY THE STREAMING SINK (streaming/native_sink.py)
    for the hash-gated write->read streaming loop: two NDJSON micro-batches
    (maxFilesPerTrigger=1) land as two append snapshots via
    writeStream->foreachBatch->commit_append, each stamped with
    (streaming.sink-id, streaming.epoch-id); then epoch 0 is REPLAYED with
    a poison row (id 99) and must publish nothing — the gated query pins
    both the row set (ids 1..6, val = 10·id; no 99) and the snapshot count
    (2: the replay committed no third)."""
    import json as _json
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import create_table
    from iceberg_meta_spark.streaming.native_sink import (
        append_epoch,
        write_stream,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_sink_v1"
    )
    table = os.path.join(base, "sink_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for name, ids in (("a.json", (1, 2, 3)), ("b.json", (4, 5, 6))):
        with open(os.path.join(src, name), "w") as fh:
            for i in ids:
                fh.write(_json.dumps({"id": i, "val": i * 10}) + "\n")
    stream = (
        spark.readStream.schema("id long, val long")
        .option("maxFilesPerTrigger", "1").json(src)
    )
    q = (
        write_stream(stream, table, os.path.join(base, "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # replay epoch 0 with a poison row: exactly-once means NOTHING lands
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    md = _json.load(
        open(os.path.join(table, "metadata", f"v{v}.metadata.json"))
    )
    sink_id = md["snapshots"][0]["summary"]["streaming.sink-id"]
    poison = spark.createDataFrame([(99, 990)], "id long, val long")
    out = append_epoch(poison, 0, table, sink_id)
    assert out["committed"] is False
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_dv_table(spark) -> str:
    """A FORMAT-VERSION 3 table with deletion vectors for the hash-gated
    DV scan: two appended data files (ids 0..9, 10..19; val = 10·id), then
    one Puffin file holding a roaring deletion vector per data file —
    positions {0, 3} of batch1 (ids 0, 3) and {5} of batch2 (id 15) —
    committed as position-delete entries carrying referenced_data_file/
    content_offset/content_size_in_bytes (spec field-ids 143/144/145).
    The MoR scan must serve ids 0..19 minus {0, 3, 15}: 17 rows, closed
    form for the oracle."""
    import glob
    import tempfile

    from iceberg_meta_spark.sources.iceberg_dv import (
        commit_dv_files,
        write_dv_file,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_dv_v1")
    table = os.path.join(base, "dv_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "val", "long")],
        format_version=3,
    )
    paths = []
    for b, ids in enumerate((range(0, 10), range(10, 20))):
        rows = [(i, i * 10) for i in ids]
        d = os.path.join(table, "data", f"b{b}")
        (spark.createDataFrame(rows, "id long, val long").coalesce(1)
         .write.mode("overwrite").parquet(d))
        [p] = glob.glob(os.path.join(d, "*.parquet"))
        commit_append(table, [{
            "file_path": p, "record_count": 10,
            "file_size_in_bytes": os.path.getsize(p),
            "lower_bounds": {1: min(ids)}, "upper_bounds": {1: max(ids)},
        }], timestamp_ms=1713139200000 + 60_000 * (b + 1))
        paths.append(p)
    dv_path = os.path.join(table, "data", "dv-1.puffin")
    entries = write_dv_file(
        dv_path, {paths[0]: [0, 3], paths[1]: [5]},
        snapshot_id=3, sequence_number=3,
    )
    commit_dv_files(table, entries, timestamp_ms=1713139200000 + 180_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_rebase_table(spark) -> str:
    """A table whose SECOND append must commit PAST an orphaned metadata
    claim (HadoopTableOperations.findVersion semantics, the r10 commit
    retry's version-resolution half): after the first append publishes v2,
    a crashed writer's claim is simulated by copying v2 -> v3 with the
    hint still at 2; the next append must base on v3 and claim v4 — never
    overwrite v3, never spin on the stale hint. The gated query pins the
    row set, the final metadata version (4) and the snapshot count (2)."""
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_rebase_v1"
    )
    table = os.path.join(base, "rebase_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in (1, 2, 3)],
                              "id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    meta = os.path.join(table, "metadata")
    # the crashed winner: v3 exists, hint still points at 2
    shutil.copy(os.path.join(meta, "v2.metadata.json"),
                os.path.join(meta, "v3.metadata.json"))
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in (4, 5, 6)],
                              "id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 120_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_rest_committed_table(spark) -> str:
    """A table whose every snapshot was committed THROUGH the REST-catalog
    protocol (sources/iceberg_rest.py) against the loopback CAS server
    (sources/iceberg_rest_mock.py): load-table, build the snapshot, POST
    updateTable with assert-table-uuid + assert-ref-snapshot-id(main), the
    second commit chaining onto the first — plus THREE RACING writers on
    one barrier whose losers rebase through 409s, and a set-properties
    update. Closed form: ids 0..19 (val = 10*id) from the two sequential
    commits plus 100..105 from the three racers; 5 snapshots in one
    serialized chain; owner property set."""
    import tempfile
    import threading

    from iceberg_meta_spark.sources.iceberg_rest import (
        RestCatalog,
        rest_append_dataframe,
        rest_append_files,
    )
    from iceberg_meta_spark.sources.iceberg_rest_mock import (
        LoopbackRestCatalog,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        create_table,
        write_dataframe_files,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_native_fixture_rest_v1")
    table = os.path.join(base, "rest_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    with LoopbackRestCatalog() as server:
        catalog = RestCatalog(server.uri)
        server.register("ns.t", table)
        for bi, ids in enumerate((range(0, 10), range(10, 20))):
            rest_append_dataframe(
                spark,
                catalog, "ns.t",
                spark.createDataFrame([(i, i * 10) for i in ids],
                                      "id long, val long").coalesce(1),
                timestamp_ms=1713139200000 + 60_000 * (bi + 1),
            )
        # three writers race the same parent: losers rebase through 409
        _, md = catalog.load_table("ns.t")
        files = []
        for w in range(3):
            ids = [100 + 2 * w, 101 + 2 * w]
            files.append(write_dataframe_files(
                spark,
                spark.createDataFrame([(i, i * 10) for i in ids],
                                      "id long, val long").coalesce(1),
                md, os.path.join(table, "data", f"race{w}"),
            ))
        barrier = threading.Barrier(3)
        errors = []

        def writer(w):
            try:
                barrier.wait()
                rest_append_files(catalog, "ns.t", files[w],
                                  timestamp_ms=1713139200000 + 300_000 + w)
            except Exception as e:  # noqa: BLE001 - surfaced below
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        catalog.commit_table("ns.t", requirements=[], updates=[
            {"action": "set-properties", "updates": {"owner": "rest-pipeline"}}
        ])
        _, md = catalog.load_table("ns.t")
        assert len(md["snapshots"]) == 5, md["snapshots"]
        parents = {s.get("parent-snapshot-id") for s in md["snapshots"]}
        assert len(parents) == 5, "commit chain must be serialized"
        assert md["properties"]["owner"] == "rest-pipeline"
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_row_lineage_table(spark) -> str:
    """A v3 table exercising row lineage: two appends (ids 0..4, 5..9 at
    val = 10*id — first_row_id 0 and 5, sequence numbers 1 and 2), then
    ``delete_where(id BETWEEN 2 AND 6)`` publishing deletion vectors.
    Closed form: survivors keep _row_id == id (MoR deletes never move
    surviving rows) with _last_updated_sequence_number 1 for ids < 5 and
    2 above; next-row-id stays 10 (the DV snapshot added no rows)."""
    import json
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_lineage_v1"
    )
    table = os.path.join(base, "lineage_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    for bi, ids in enumerate((range(0, 5), range(5, 10))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10) for i in ids],
                                  "id long, val long").coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (bi + 1),
        )
    out = delete_where(spark, table, ("id", 2, 6),
                       timestamp_ms=1713139200000 + 180_000)
    assert out["rows_deleted"] == 5, out
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    with open(os.path.join(table, "metadata", f"v{v}.metadata.json")) as fh:
        md = json.load(fh)
    assert md["next-row-id"] == 10, md
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_column_defaults_table(spark) -> str:
    """A v3 table exercising default-value columns: ids 1..2 appended,
    then ALTER adds region (default 'unknown') and score (default 0),
    then ids 3..4 appended WITH the columns — id 4's region/score
    explicitly NULL. Closed form: 1..2 serve the defaults, 3 serves its
    written values, 4 serves NULL (initial-default never overwrites an
    explicitly-written NULL)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_schema,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_defaults_v1"
    )
    table = os.path.join(base, "defaults_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
        .coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    update_schema(table, add=[("region", "string", "unknown"),
                              ("score", "long", 0)],
                  timestamp_ms=1713139200000 + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame(
            [(3, 30, "eu", 7), (4, 40, None, None)],
            "id long, val long, region string, score long",
        ).coalesce(1),
        table, timestamp_ms=1713139200000 + 120_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_update_where_table(spark) -> str:
    """A v3 table after UPDATE ... SET ... WHERE: ids 0..9 (val = 10*id,
    tag 'a') in two files, then ``update_where(val = val + 1000,
    tag = 'hot', WHERE id BETWEEN 3 AND 6)`` — ONE atomic snapshot:
    deletion vectors hide the four old versions, the rewritten rows ride
    new data files at the same sequence number. Closed form: vals shifted
    +1000 and tag 'hot' for 3..6, everything else untouched."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_where,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_update_v1"
    )
    table = os.path.join(base, "update_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long"),
                                (3, "tag", "string")],
                 format_version=3)
    for bi, ids in enumerate((range(0, 5), range(5, 10))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10, "a") for i in ids],
                                  "id long, val long, tag string").coalesce(1),
            table, timestamp_ms=1713139200000 + 60_000 * (bi + 1),
        )
    out = update_where(spark, table, {"val": "val + 1000", "tag": "'hot'"},
                       ("id", 3, 6), timestamp_ms=1713139200000 + 180_000)
    assert out["rows_updated"] == 4, out
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_rename_scan_table(spark) -> str:
    """A table read across a RENAME COLUMN: ids 1..2 written under the
    original name (val), the column renamed to amount, id 3 written under
    the new name, then amount renamed again to total. Closed form: all
    three rows serve their written values under the CURRENT name — the
    scan resolves each file's write-time column name through the schema
    history (renames keep the field id; files are name-based parquet)."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_schema,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_rename_v1"
    )
    table = os.path.join(base, "rename_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
        .coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    update_schema(table, rename={"val": "amount"},
                  timestamp_ms=1713139200000 + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame([(3, 30)], "id long, amount long").coalesce(1),
        table, timestamp_ms=1713139200000 + 120_000,
    )
    update_schema(table, rename={"amount": "total"},
                  timestamp_ms=1713139200000 + 150_000)
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_type_widening_table(spark) -> str:
    """A table read across type promotions (spec § Schema Evolution):
    (qty int, ratio float) written, then widened to (long, double), then
    a wide row appended whose qty overflows int32. Closed form: all three
    rows serve at the WIDE types — the scan's explicit promoted read
    schema upcasts the narrow file (mergeSchema would refuse the union)
    and zone-map bounds decode buffer-width-aware."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_schema,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_widen_v1"
    )
    table = os.path.join(base, "widen_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "qty", "int"),
                                (3, "ratio", "float")])
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 5, 1.5), (2, 6, 2.5)],
                              "id long, qty int, ratio float").coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    update_schema(table, widen={"qty": "long", "ratio": "double"},
                  timestamp_ms=1713139200000 + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame([(3, 7_000_000_000, 3.25)],
                              "id long, qty long, ratio double").coalesce(1),
        table, timestamp_ms=1713139200000 + 120_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_changelog_updates_table(spark) -> str:
    """A table for the changelog's compute-updates mode: ids 0..4
    appended (snapshot 1), then MERGE upserts id 2 -> 999 and inserts
    id 9 (snapshot 2). Closed form from snapshot 1 with key_cols=["id"]:
    one update_before/update_after pair for id 2 plus one plain insert
    for id 9."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        merge_into,
    )

    base = os.path.join(
        tempfile.gettempdir(), "iceberg_meta_native_fixture_cdcupd_v1"
    )
    table = os.path.join(base, "cdcupd_table")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in range(5)],
                              "id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000,
    )
    merge_into(
        spark,
        spark.createDataFrame([(2, 999), (9, 90)], "id long, val long")
        .coalesce(1),
        table, ["id"], timestamp_ms=1713139200000 + 120_000,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_rest_dml_table(spark) -> str:
    """A table whose ENTIRE write history — INSERT, row-level DELETE,
    UPDATE, MERGE, compaction, snapshot expiry — committed THROUGH the
    REST-catalog protocol (api.register_rest_table + api.sql against the
    loopback CAS server): every snapshot publishes as an updateTable
    ``add-snapshot`` + ``set-snapshot-ref``, the expiry as the spec's
    ``remove-snapshots`` action. Closed form: ids 0..19 at val = 10*id,
    minus the DELETEd 4..6, with UPDATE +1 on ids >= 18, MERGE upsert
    (2 -> 555) and insert (100 -> 1000); compaction absorbs the deletes
    and expiry leaves exactly ONE snapshot (asserted), so the scan serves
    18 rows from the compacted layout."""
    import tempfile

    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.iceberg_rest import (
        RestCatalog,
        rest_expire_snapshots,
    )
    from iceberg_meta_spark.sources.iceberg_rest_mock import (
        LoopbackRestCatalog,
    )
    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(),
                        "iceberg_meta_native_fixture_rest_dml_v1")
    table = os.path.join(base, "rest_dml")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    with LoopbackRestCatalog() as server:
        catalog = RestCatalog(server.uri)
        server.register("ns.dml", table)
        api.register_rest_table(spark, catalog, "ns.dml", "rest_dml_fx")
        api.sql(spark, "INSERT INTO rest_dml_fx SELECT id, id * 10 "
                       "FROM range(0, 10)")
        api.sql(spark, "INSERT INTO rest_dml_fx SELECT id, id * 10 "
                       "FROM range(10, 20)")
        api.sql(spark, "DELETE FROM rest_dml_fx WHERE id BETWEEN 4 AND 6")
        api.sql(spark, "UPDATE rest_dml_fx SET val = val + 1 WHERE id >= 18")
        spark.createDataFrame([(2, 555), (100, 1000)], "id long, val long") \
            .createOrReplaceTempView("rest_dml_fx_src")
        api.sql(spark, "MERGE INTO rest_dml_fx USING rest_dml_fx_src ON id")
        out = api.sql(spark,
                      "CALL rewrite_data_files('rest_dml_fx')").collect()[0]
        assert int(out.rewritten_files) >= 2, out
        res = rest_expire_snapshots(catalog, "ns.dml", keep_last=1)
        assert len(res["expired_snapshot_ids"]) == 5, res
        _, md = catalog.load_table("ns.dml")
        assert len(md["snapshots"]) == 1, md["snapshots"]
        assert md["snapshots"][0]["summary"]["operation"] == "replace"
    with open(marker, "w") as fh:
        fh.write("ok")
    return table


def default_delete_expr_table(spark) -> str:
    """A v3 table exercising the r12 arbitrary-WHERE dialect: ids 0..19
    (val = 10*id), then ``DELETE WHERE id < 3 OR id >= 17`` (a top-level
    OR — no interval conjunct is implied, so pruning degrades to the
    residual row filter over every file) and ``UPDATE SET val = -1 WHERE
    id IN (8, 9) AND val >= 0`` (the IN runs as residual; the ``val >= 0``
    conjunct still prunes). Closed form: ids 3..16 survive, vals 10*id
    except -1 at ids 8 and 9; both commits publish deletion vectors."""
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
        update_where,
    )

    base = os.path.join(tempfile.gettempdir(),
                        "iceberg_meta_native_fixture_delete_expr_v1")
    table = os.path.join(base, "t")
    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return table
    ts = 1713139200000
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    for bi, ids in enumerate((range(0, 10), range(10, 20))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10) for i in ids],
                                  "id long, val long").coalesce(1),
            table, timestamp_ms=ts + 60_000 * (bi + 1))
    out = delete_where(spark, table, "id < 3 OR id >= 17",
                       timestamp_ms=ts + 180_000)
    assert out["rows_deleted"] == 6, out
    out = update_where(spark, table, {"val": "-1"},
                       "id IN (8, 9) AND val >= 0",
                       timestamp_ms=ts + 240_000)
    assert out["rows_updated"] == 2, out
    with open(marker, "w") as fh:
        fh.write("ok")
    return table
