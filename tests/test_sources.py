"""Source-adapter and sink tests: Iceberg conf assembly + runtime gating
(jar-free), JSON/CSV/parquet sinks round-trips."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.sources import iceberg as ice
from iceberg_meta_spark.sources import sinks


def test_iceberg_session_conf_assembly():
    conf = ice.iceberg_session_conf(
        "prod",
        catalog_type="rest",
        uri="http://rest:8181",
        warehouse="s3://wh",
        s3_endpoint="http://minio:9000",
        s3_access_key="ak",
        s3_secret_key="sk",
        extra={"io-impl": "org.apache.iceberg.aws.s3.S3FileIO"},
    )
    assert conf["spark.sql.catalog.prod"] == ice.SPARK_CATALOG_IMPL
    assert conf["spark.sql.catalog.prod.type"] == "rest"
    assert conf["spark.sql.catalog.prod.uri"] == "http://rest:8181"
    assert conf["spark.sql.catalog.prod.warehouse"] == "s3://wh"
    # client-side S3 override (reference catalog.py:155-160)
    assert conf["spark.sql.catalog.prod.s3.endpoint"] == "http://minio:9000"
    assert conf["spark.sql.catalog.prod.io-impl"].endswith("S3FileIO")
    assert conf["spark.sql.extensions"] == ice.EXTENSIONS


def test_iceberg_conf_minimal():
    conf = ice.iceberg_session_conf(
        "local", catalog_type="hadoop", warehouse="/tmp/wh", env={}
    )
    assert "spark.sql.catalog.local.uri" not in conf
    assert conf["spark.sql.catalog.local.warehouse"] == "/tmp/wh"


def test_catalog_props_three_level_priority():
    """S11 resolution (reference catalog.py:99-142): file props resolve
    ``${VAR}`` placeholders, explicit kwargs override file values, and
    ICEBERG_META_* env vars overlay LAST — winning even over explicit
    values, exactly as the reference's _apply_env_overrides does."""
    env = {
        "WH_BUCKET": "s3://expanded-wh",
        "ICEBERG_META_S3_ENDPOINT": "http://env-minio:9000",
    }
    props = ice.resolve_catalog_props(
        file_props={
            "uri": "http://file-rest:8181",
            "warehouse": "${WH_BUCKET}",
            "s3.endpoint": "http://file-minio:9000",
            "some-flag": True,  # YAML bool coerces to lowercase string
        },
        env=env,
        uri="http://cli-rest:8181",
    )
    assert props["uri"] == "http://cli-rest:8181"  # explicit > file
    assert props["warehouse"] == "s3://expanded-wh"  # ${VAR} expanded
    assert props["s3.endpoint"] == "http://env-minio:9000"  # env > all
    assert props["some-flag"] == "true"

    with pytest.raises(ValueError, match="UNSET_VAR"):
        ice.resolve_catalog_props(file_props={"uri": "${UNSET_VAR}"}, env={})


def test_session_conf_env_overlay():
    env = {"ICEBERG_META_CATALOG_URI": "http://env-rest:9999"}
    conf = ice.iceberg_session_conf(
        "prod", uri="http://cli-rest:8181", env=env
    )
    assert conf["spark.sql.catalog.prod.uri"] == "http://env-rest:9999"


def test_metadata_table_requires_runtime(spark):
    # No Iceberg jar in this container: the probe must say so and readers
    # must fail with the actionable error, not an opaque Py4J one.
    assert ice.has_iceberg_runtime(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        ice.metadata_table(spark, "cat.db.t", "snapshots")


def test_metadata_table_rejects_unknown_kind(spark):
    with pytest.raises(ValueError, match="unknown metadata table"):
        ice.metadata_table(spark, "cat.db.t", "nonsense")


def test_write_json_projection(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, x double")
    out = str(tmp_path / "j")
    sinks.write_json(df, out, columns=["name", "id"])
    rows = []
    for fn in os.listdir(out):
        if fn.endswith(".json"):
            with open(os.path.join(out, fn)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(rows, key=lambda r: r["id"]) == [{"name": "a", "id": 1}, {"name": "b", "id": 2}]


def test_write_csv_header(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = str(tmp_path / "c")
    sinks.write_csv(df, out)
    content = ""
    for fn in os.listdir(out):
        if fn.endswith(".csv"):
            content += open(os.path.join(out, fn)).read()
    assert content.splitlines()[0] == "id,name"
    assert "1,a" in content


def test_json_lines_stays_distributed(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = sinks.json_lines(df, columns=["id"])
    assert out.columns == ["json"]
    assert json.loads(out.collect()[0].json) == {"id": 1}


def test_append_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    d1 = spark.createDataFrame([(1,)], "id long")
    d2 = spark.createDataFrame([(2,)], "id long")
    sinks.append_parquet(d1, path)
    sinks.append_parquet(d2, path)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == [1, 2]
    sinks.overwrite_parquet(d1, path)
    assert [r.id for r in spark.read.parquet(path).collect()] == [1]


def test_unknown_projection_column_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception):
        sinks.write_json(df, "/tmp/never", columns=["nope"])


def test_files_frame_shape_without_runtime(spark):
    # The normalizers gate on the runtime too (they call metadata_table).
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        ice.files_frame(spark, "cat.db.t")


def test_normalize_file_ranges_from_readable_metrics(spark):
    # synthetic frame with the .files nested readable_metrics shape —
    # the projection must yield (file_path, lo, hi) longs with no decode UDF
    df = spark.createDataFrame(
        [
            ("f1", ((10, 99),)),
            ("f2", ((50, 150),)),
        ],
        "file_path string, readable_metrics struct<ts:struct<lower_bound:long, upper_bound:long>>",
    )
    out = ice.normalize_file_ranges(df, "ts")
    assert out.columns == ["file_path", "lo", "hi"]
    rows = {r.file_path: (r.lo, r.hi) for r in out.collect()}
    assert rows == {"f1": (10, 99), "f2": (50, 150)}


def test_schema_fields_from_metadata_json(spark):
    # v2 table-metadata with two schema versions, nested types, a rename
    meta = {
        "format-version": 2,
        "schemas": [
            {
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "type": "long", "required": True},
                    {"id": 2, "name": "tags", "type": {"type": "list", "element": "string"}},
                ],
            },
            {
                "schema-id": 1,
                "fields": [
                    {"id": 1, "name": "id", "type": "long", "required": True},
                    {
                        "id": 3,
                        "name": "loc",
                        "type": {
                            "type": "struct",
                            "fields": [
                                {"id": 4, "name": "lat", "type": "double"},
                                {"id": 5, "name": "lon", "type": "double"},
                            ],
                        },
                    },
                ],
            },
        ],
    }
    out = ice.schema_fields_from_metadata(spark, meta, "db.t")
    rows = {(r.schema_id, r.field_id): r for r in out.collect()}
    assert set(rows) == {(0, 1), (0, 2), (1, 1), (1, 3)}
    assert rows[(0, 2)].type == "list<string>"
    assert rows[(1, 3)].type == "struct<lat: double, lon: double>"
    assert rows[(0, 1)].required is True and rows[(0, 2)].required is False
    # v1 single-schema form normalizes the same way
    v1 = {"schema": {"fields": [{"id": 1, "name": "x", "type": "int"}]}}
    assert ice.schema_fields_from_metadata(spark, v1, "t").count() == 1


def test_schema_fields_feed_schema_diff(spark):
    # the normalized frame must drop straight into the J2 kernel
    from iceberg_meta_spark import operators as ops

    meta = {
        "schemas": [
            {"schema-id": 1, "fields": [{"id": 1, "name": "a", "type": "int"}]},
            {
                "schema-id": 2,
                "fields": [
                    {"id": 1, "name": "a", "type": "long"},
                    {"id": 2, "name": "b", "type": "string"},
                ],
            },
        ]
    }
    fields = ice.schema_fields_from_metadata(spark, meta, "db.t")
    d = {r.field_id: r.change for r in ops.schema_diff(fields, old_id=1, new_id=2).collect()}
    assert d[1] == "changed" and d[2] == "added"


def test_iceberg_write_sql_text():
    assert (
        sinks.iceberg_write_sql("cat.db.t", "append")
        == "INSERT INTO cat.db.t SELECT * FROM __source__"
    )
    assert (
        sinks.iceberg_write_sql("cat.db.t", "overwrite_partitions", ["a", "b"])
        == "INSERT OVERWRITE cat.db.t (a, b) SELECT a, b FROM __source__"
    )
    with pytest.raises(ValueError):
        sinks.iceberg_write_sql("t", "truncate")


def test_iceberg_writes_are_jar_gated(spark):
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        sinks.append_iceberg(df, "cat.db.t")
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        sinks.overwrite_partitions_iceberg(df, "cat.db.t")


def test_write_training_shards_deterministic_and_balanced(spark, tmp_path):
    from iceberg_meta_spark.sources.sinks import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    write_training_shards(docs, p1, n_shards=4, shuffle_salt="s1")
    write_training_shards(docs, p2, n_shards=4, shuffle_salt="s1")

    r1 = spark.read.parquet(p1)
    # nothing lost, every shard populated, shards roughly balanced
    assert r1.count() == docs.count()
    sizes = {row["__shard"]: row["n"] for row in
             r1.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2 * min(sizes.values())

    # same salt -> identical shard assignment AND within-shard order
    a = r1.select("__shard", "__shuffle_key", "doc_id").orderBy("__shard", "__shuffle_key").collect()
    b = spark.read.parquet(p2).select("__shard", "__shuffle_key", "doc_id").orderBy(
        "__shard", "__shuffle_key").collect()
    assert a == b

    # a different salt produces a different permutation
    p3 = str(tmp_path / "run3")
    write_training_shards(docs, p3, n_shards=4, shuffle_salt="s2")
    c = spark.read.parquet(p3).select("doc_id", "__shard").orderBy("doc_id").collect()
    base = r1.select("doc_id", "__shard").orderBy("doc_id").collect()
    assert [r["__shard"] for r in c] != [r["__shard"] for r in base]


def test_snapshot_log_python_datasource(spark, tmp_path):
    """The Python DataSource adapter: NDJSON snapshot logs read as a
    partitioned scan (one task per file), feeding the same snapshot
    kernels the fixture source feeds."""
    import json

    from iceberg_meta_spark.operators.snapshots import recent_snapshots
    from iceberg_meta_spark.sources.pyds import SnapshotLogDataSource

    recs = [
        {"snapshot_id": i, "parent_id": i - 1 if i else None,
         "committed_us": 1_000_000 * i, "operation": "append",
         "added_records": 10 * i, "deleted_records": 0,
         "total_data_files": i + 1, "total_files_size": 100 * (i + 1)}
        for i in range(6)
    ]
    # two log files -> two input partitions
    (tmp_path / "a.jsonl").write_text("\n".join(json.dumps(r) for r in recs[:3]))
    (tmp_path / "b.jsonl").write_text("\n".join(json.dumps(r) for r in recs[3:]))

    spark.dataSource.register(SnapshotLogDataSource)
    df = spark.read.format("snapshot_log").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 2
    rows = {r.snapshot_id: r for r in df.collect()}
    assert len(rows) == 6 and rows[0].parent_id is None
    assert rows[5].total_files_size == 600
    # the snapshot kernels run on it unchanged
    top = recent_snapshots(df, k=2).collect()
    assert [r.snapshot_id for r in top] == [5, 4]


def test_snapshot_log_datasource_filter_pushdown(spark, tmp_path):
    """snapshot_id comparisons push into the custom reader (filtered rows
    never cross the Python->JVM boundary); non-pushable predicates still
    evaluate correctly Spark-side."""
    import json

    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.pyds import SnapshotLogDataSource

    recs = [
        {"snapshot_id": i, "parent_id": None, "committed_us": i,
         "operation": "append" if i % 2 else "overwrite",
         "added_records": i, "deleted_records": 0,
         "total_data_files": 1, "total_files_size": 10}
        for i in range(10)
    ]
    (tmp_path / "log.jsonl").write_text("\n".join(json.dumps(r) for r in recs))
    spark.dataSource.register(SnapshotLogDataSource)
    df = spark.read.format("snapshot_log").option("path", str(tmp_path)).load()

    got = df.filter((F.col("snapshot_id") > 3) & (F.col("snapshot_id") < 8)).collect()
    assert sorted(r.snapshot_id for r in got) == [4, 5, 6, 7]
    # the pushed comparison vanishes from the physical plan (only the
    # non-pushable isnotnull residual may remain) — the reader applied it,
    # Spark has nothing comparison-shaped left to evaluate
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.filter(F.col("snapshot_id") > 3).explain()
    p = buf.getvalue()
    assert "> 3" not in p, p
    # a non-pushable predicate stays as a Spark-side Filter
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        df.filter(F.col("operation") == "append").explain()
    assert "append" in buf2.getvalue()
    # mixed pushable + non-pushable: both apply
    got2 = df.filter((F.col("snapshot_id") > 5) & (F.col("operation") == "append")).collect()
    assert sorted(r.snapshot_id for r in got2) == [7, 9]


def test_snapshot_log_datasource_writer_roundtrip(spark, tmp_path):
    """The writable half of the custom source: tasks stage tmp files, the
    driver commit publishes part-*.jsonl plus a _manifest.json — and the
    reader round-trips the rows exactly."""
    import json

    from iceberg_meta_spark.sources.pyds import SnapshotLogDataSource

    spark.dataSource.register(SnapshotLogDataSource)
    out = str(tmp_path / "log")
    df = spark.createDataFrame(
        [(i, i - 1 if i else None, 1_000_000 * i, "append", 10 * i, 0, i + 1, 100 * (i + 1))
         for i in range(8)],
        "snapshot_id long, parent_id long, committed_us long, operation string, "
        "added_records long, deleted_records long, total_data_files long, "
        "total_files_size long",
    ).repartition(3)
    df.write.format("snapshot_log").mode("append").option("path", out).save()

    import os

    files = sorted(os.listdir(out))
    assert "_manifest.json" in files
    assert not [f for f in files if f.endswith(".tmp")]
    manifest = json.loads((tmp_path / "log" / "_manifest.json").read_text())
    assert manifest["total_rows"] == 8
    assert {e["file"] for e in manifest["files"]} == {
        f for f in files if f.endswith(".jsonl")
    }

    back = spark.read.format("snapshot_log").option("path", out).load()
    assert {r.snapshot_id: r.total_files_size for r in back.collect()} == {
        i: 100 * (i + 1) for i in range(8)
    }


def test_snapshot_log_datasource_overwrite_retires_previous_set(spark, tmp_path):
    import json
    import os

    from iceberg_meta_spark.sources.pyds import SnapshotLogDataSource

    spark.dataSource.register(SnapshotLogDataSource)
    out = str(tmp_path / "log")
    schema = (
        "snapshot_id long, parent_id long, committed_us long, operation string, "
        "added_records long, deleted_records long, total_data_files long, "
        "total_files_size long"
    )
    first = spark.createDataFrame(
        [(i, None, i, "append", 1, 0, 1, 10) for i in range(5)], schema
    )
    first.write.format("snapshot_log").mode("append").option("path", out).save()
    second = spark.createDataFrame(
        [(100 + i, None, i, "overwrite", 1, 0, 1, 10) for i in range(2)], schema
    )
    second.write.format("snapshot_log").mode("overwrite").option("path", out).save()

    back = spark.read.format("snapshot_log").option("path", out).load()
    assert sorted(r.snapshot_id for r in back.collect()) == [100, 101]
    manifest = json.loads((tmp_path / "log" / "_manifest.json").read_text())
    assert manifest["total_rows"] == 2
    # append after overwrite accumulates
    first.limit(1).write.format("snapshot_log").mode("append").option("path", out).save()
    assert spark.read.format("snapshot_log").option("path", out).load().count() == 3


def test_snapshot_log_datasource_stream_reader(spark, tmp_path):
    """Streaming half of the custom source: new log files AND new lines in
    existing files arrive as micro-batch rows exactly once."""
    import json as _json
    import time

    from iceberg_meta_spark.sources.pyds import SnapshotLogDataSource

    def rec(i):
        return {"snapshot_id": i, "parent_id": None, "committed_us": i,
                "operation": "append", "added_records": 1, "deleted_records": 0,
                "total_data_files": 1, "total_files_size": 10}

    d = tmp_path / "log"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(_json.dumps(rec(i)) for i in (1, 2)) + "\n")

    spark.dataSource.register(SnapshotLogDataSource)
    seen: list[int] = []

    q = (
        spark.readStream.format("snapshot_log")
        .option("path", str(d))
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: seen.extend(r.snapshot_id for r in b.collect()))
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_for(pred, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: sorted(seen) == [1, 2]), seen
        # grow an existing file AND add a new one mid-stream
        with open(d / "a.jsonl", "a", encoding="utf-8") as fh:
            fh.write(_json.dumps(rec(3)) + "\n")
        (d / "b.jsonl").write_text(_json.dumps(rec(4)) + "\n")
        assert wait_for(lambda: sorted(seen) == [1, 2, 3, 4]), seen
        assert len(seen) == 4  # exactly once, no replays
    finally:
        q.stop()


def test_snapshot_log_stream_tolerates_retired_files(tmp_path):
    """A batch-mode overwrite retires committed files; a stream whose offset
    still names them must treat them as fully consumed, not crash (both the
    forward read and recovery replay paths)."""
    import json as _json

    from iceberg_meta_spark.sources.pyds import _SnapshotLogStreamReader

    def rec(i):
        return {"snapshot_id": i, "parent_id": None, "committed_us": i,
                "operation": "append", "added_records": 1, "deleted_records": 0,
                "total_data_files": 1, "total_files_size": 10}

    d = tmp_path / "log"
    d.mkdir()
    (d / "a.jsonl").write_text(_json.dumps(rec(1)) + "\n" + _json.dumps(rec(2)) + "\n")
    reader = _SnapshotLogStreamReader({"path": str(d)})

    rows, end = reader.read(reader.initialOffset())
    assert sorted(r[0] for r in rows) == [1, 2]
    assert end["files"]["a.jsonl"] == 2

    # overwrite retires a.jsonl, commits b.jsonl
    (d / "a.jsonl").unlink()
    (d / "b.jsonl").write_text(_json.dumps(rec(3)) + "\n")

    rows2, end2 = reader.read(end)
    assert [r[0] for r in rows2] == [3]
    assert end2["files"]["a.jsonl"] == 2  # retired file stays fully consumed

    # recovery replay across the retirement must not raise and must
    # deliver only rows from files that still exist
    replayed = list(reader.readBetweenOffsets(end, end2))
    assert [r[0] for r in replayed] == [3]


def test_write_clustered_zorder_files_are_range_local(spark, tmp_path):
    """The clustered rewrite puts both dimensions' ranges local per file:
    every file's (x, y) bounding box must cover far less than the full
    domain, and a 2-D range predicate must be prunable to a file subset
    via parquet footer min/max (the zone-map payoff the planner scores)."""
    import pyarrow.parquet as papq
    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.sinks import write_clustered

    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),
        ((F.col("id") * 40503 + 17) % n).alias("y"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, "x", "y", bits=12, n_files=16)

    back = spark.read.parquet(out)
    assert back.count() == n
    assert set(back.columns) == {"x", "y", "payload"}  # no helper columns leak

    import glob
    spans = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        t = papq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        spans.append(((max(xs) - min(xs)), (max(ys) - min(ys))))
    assert len(spans) >= 8
    # z-clustering: the MEDIAN per-file span in each dimension is a
    # fraction of the n-wide domain (unclustered random files span ~n)
    med_x = sorted(s[0] for s in spans)[len(spans) // 2]
    med_y = sorted(s[1] for s in spans)[len(spans) // 2]
    assert med_x < n * 0.6 and med_y < n * 0.6
    # a small 2-D box prunes most files on footer min/max alone
    qx, qy = n // 8, n // 8
    hit = sum(1 for f in sorted(glob.glob(out + "/part-*.parquet"))
              if (lambda t: min(t["x"].to_pylist()) <= qx and max(t["x"].to_pylist()) >= 0
                  and min(t["y"].to_pylist()) <= qy and max(t["y"].to_pylist()) >= 0)(
                      papq.read_table(f, columns=["x", "y"])))
    assert hit < len(spans)


def test_snapshot_log_datasource_stream_writer(spark, tmp_path):
    """The streaming-sink quadrant of the custom source: a live stream of
    snapshot rows lands as per-epoch two-phase commits in the same NDJSON
    log the batch writer produces; the manifest records committed epochs,
    no .tmp files survive, and the batch reader round-trips every row.
    Also pins replay idempotence: re-committing an already-recorded epoch
    publishes nothing."""
    import json
    import os
    import time

    from iceberg_meta_spark.sources.pyds import (
        SnapshotLogDataSource,
        _LogCommit,
        _SnapshotLogStreamWriter,
    )

    spark.dataSource.register(SnapshotLogDataSource)
    src = str(tmp_path / "in")
    out = str(tmp_path / "log")
    schema = ("snapshot_id long, parent_id long, committed_us long, operation string, "
              "added_records long, deleted_records long, total_data_files long, "
              "total_files_size long")

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i, i - 1 if i else None, 1_000_000 * i, "append", 10 * i, 0, i + 1, 100 * (i + 1))
             for i in range(lo, hi)],
            schema,
        )

    mk(0, 5).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.writeStream.format("snapshot_log")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_rows(n, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                m = json.loads((tmp_path / "log" / "_manifest.json").read_text())
                if m.get("total_rows", 0) >= n:
                    return m
            except (FileNotFoundError, json.JSONDecodeError):
                pass
            time.sleep(0.5)
        raise AssertionError("stream sink never reached expected rows")

    try:
        wait_rows(5)
        mk(5, 9).write.mode("append").parquet(src)
        manifest = wait_rows(9)
    finally:
        q.stop()

    assert manifest["epochs"] and len(manifest["epochs"]) >= 1
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    back = spark.read.format("snapshot_log").option("path", out).load()
    assert {r.snapshot_id: r.total_files_size for r in back.collect()} == {
        i: 100 * (i + 1) for i in range(9)
    }

    # replayed epoch: stage a file and re-commit an epoch id the manifest
    # already records — nothing new may be published
    epoch = manifest["epochs"][0]
    w = _SnapshotLogStreamWriter({"path": out}, overwrite=False)
    stale = "stream-part-99999-deadbeef.tmp"
    (tmp_path / "log" / stale).write_text('{"snapshot_id": 999}\n')
    before = sorted(os.listdir(out))
    w.commit([_LogCommit(stale, 1)], epoch)
    after = sorted(os.listdir(out))
    assert stale not in after
    assert [f for f in after if f.endswith(".jsonl")] == [
        f for f in before if f.endswith(".jsonl")
    ]


def test_write_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed identically on the join key must join with ZERO
    Exchange on either side (co-partitioning proven from the catalog), and
    sortBy buckets let sort-merge join skip its Sort nodes too."""
    import contextlib
    import io

    from iceberg_meta_spark.sources.sinks import write_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "bkt_orders", "o_orderkey", n_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
        ),
        "bkt_lineitem", "o_orderkey", n_buckets=8, sort_cols=["o_orderkey"],
    )
    try:
        a = spark.table("bkt_orders")
        b = spark.table("bkt_lineitem")
        joined = a.join(b, "o_orderkey")
        # disable AQE for a stable pre-execution plan (house convention) and
        # broadcast (a broadcast join would sidestep — and disable — the
        # bucketed scan; at real scale neither fact side fits a broadcast)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            p = buf.getvalue()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p, p
        # pre-sorted buckets: no Sort node feeds the join
        assert "(Sort" not in p.replace("SortMergeJoin", "SMJ"), p
        # and the result is right
        expect = (
            orders.select("o_orderkey")
            .join(lineitem.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey")
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


# --- doctor (reference cli.py:453-570) --------------------------------------


def test_doctor_hermetic_all_clear():
    checks = ice.doctor_checks(
        file_props={"uri": "http://rest:8181", "warehouse": "s3://wh"}, env={}
    )
    by = {(s, c): (st, d) for s, c, st, d in checks}
    assert by[("config", "config_file")][0] == "ok"
    assert by[("catalog", "resolve")][0] == "ok"
    # no session passed -> connectivity is skipped, not failed
    assert by[("connect", "runtime_jar")][0] == "skip"
    assert ice.doctor_summary(checks) == "everything looks good"


def test_doctor_flags_unset_placeholder_and_masks_secrets():
    checks = ice.doctor_checks(
        file_props={
            "uri": "${CAT_URI}",
            "s3.secret-access-key": "${S3_SECRET}",
        },
        env={"S3_SECRET": "supersecretvalue"},
    )
    by = {c: (st, d) for _, c, st, d in checks}
    assert by["${CAT_URI}"][0] == "fail"
    # set + sensitive -> masked first-4 display (reference cli.py:524-525)
    assert by["${S3_SECRET}"] == ("ok", "supe***")
    # unresolvable config -> catalog resolution fails too
    assert by["resolve"][0] == "fail"
    assert "problem" in ice.doctor_summary(checks)


def test_doctor_env_overlay_and_missing_rest_uri():
    checks = ice.doctor_checks(
        catalog_type="rest",
        file_props={},
        env={"ICEBERG_META_WAREHOUSE": "s3://wh-from-env"},
    )
    by = {c: (st, d) for _, c, st, d in checks}
    assert by["ICEBERG_META_WAREHOUSE"][0] == "ok"
    assert "warehouse" in by["ICEBERG_META_WAREHOUSE"][1]
    # env provides warehouse but nothing provides uri -> rest catalog fails
    assert by["uri"][0] == "fail"
    assert "warehouse" not in {c for _, c, st, _ in checks if st == "warn"}


def test_doctor_dataframe_report_without_jar(spark):
    from iceberg_meta_spark import api

    df = api.doctor(
        spark,
        file_props={"uri": "http://rest:8181", "warehouse": "s3://wh"},
        env={},
    )
    rows = {(r.section, r.check): r.status for r in df.collect()}
    assert df.columns == ["section", "check", "status", "detail"]
    # live session + no Iceberg jar in this container -> warn (catalogs need
    # the jar; filesystem tables are served by the r7 jar-free native reader)
    assert rows[("connect", "runtime_jar")] == "warn"
    assert rows[("summary", "verdict")] == "info"


def test_write_partitioned_dynamic_overwrite_preserves_untouched(spark, tmp_path):
    path = str(tmp_path / "part_tbl")
    base = spark.createDataFrame(
        [("day1", 1, 10.0), ("day1", 2, 20.0), ("day2", 3, 30.0)],
        "dt string, id long, v double",
    )
    sinks.write_partitioned(base, path, ["dt"], mode="overwrite")
    # re-load day 1 only, with corrected values
    fix = spark.createDataFrame(
        [("day1", 1, 11.0), ("day1", 9, 99.0)], "dt string, id long, v double"
    )
    sinks.write_partitioned(fix, path, ["dt"], mode="overwrite", dynamic=True)
    got = {(r.dt, r.id): r.v for r in spark.read.parquet(path).collect()}
    # day 1 replaced wholesale; day 2 untouched by the dynamic overwrite
    assert got == {("day1", 1): 11.0, ("day1", 9): 99.0, ("day2", 3): 30.0}


def test_write_partitioned_static_overwrite_truncates(spark, tmp_path):
    path = str(tmp_path / "part_tbl_static")
    base = spark.createDataFrame(
        [("day1", 1), ("day2", 2)], "dt string, id long"
    )
    sinks.write_partitioned(base, path, ["dt"], mode="overwrite")
    fix = spark.createDataFrame([("day1", 9)], "dt string, id long")
    sinks.write_partitioned(fix, path, ["dt"], mode="overwrite", dynamic=False)
    # static overwrite drops EVERY partition first — the documented footgun
    assert {(r.dt, r.id) for r in spark.read.parquet(path).collect()} == {("day1", 9)}


def test_write_partitioned_append_accumulates(spark, tmp_path):
    path = str(tmp_path / "part_tbl_app")
    d1 = spark.createDataFrame([("a", 1)], "k string, id long")
    d2 = spark.createDataFrame([("a", 2), ("b", 3)], "k string, id long")
    sinks.write_partitioned(d1, path, ["k"])
    sinks.write_partitioned(d2, path, ["k"])
    assert spark.read.parquet(path).count() == 3


def test_write_orc_roundtrip_with_projection(spark, tmp_path):
    path = str(tmp_path / "orc_out")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    sinks.write_orc(df, path, columns=["id", "v"])
    back = spark.read.orc(path)
    assert back.columns == ["id", "v"]
    assert {(r.id, r.v) for r in back.collect()} == {(1, 1.5), (2, 2.5)}


def test_scan_parallelism_floor_fires_only_for_tiny_tables(spark, tmp_path):
    """Uncached loads of sub-threshold single-row-group parquet get
    repartitioned to cluster parallelism (the r13 cold-path floor); tables
    over the byte bound keep the scan's own partitioning (the round-robin
    exchange would cost more than the serial map work it prevents)."""
    import iceberg_meta_spark.sources.parquet as pq

    d = str(tmp_path / "sfx")
    import os

    os.makedirs(d)
    spark.range(1000).selectExpr(
        "id AS c_custkey", "CAST(id % 5 AS INT) AS c_nationkey",
        "CAST(id AS STRING) AS c_name", "'x' AS c_address",
        "'p' AS c_phone", "CAST(id AS DOUBLE) AS c_acctbal",
        "'s' AS c_mktsegment", "'c' AS c_comment"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    was = pq._CACHE_ENABLED
    pq.enable_cache(False)
    try:
        par = spark.sparkContext.defaultParallelism
        df = pq.load_table(spark, d, "customer")
        assert df.rdd.getNumPartitions() == par
        assert df.count() == 1000
        # raise the probe result above the floor: the same load must now
        # keep the scan partitioning (memoized per (session, dir, table),
        # so use a fresh key via a second directory)
        d2 = str(tmp_path / "sfy")
        os.makedirs(d2)
        spark.range(1000).selectExpr(
            "id AS c_custkey", "CAST(id % 5 AS INT) AS c_nationkey",
            "CAST(id AS STRING) AS c_name", "'x' AS c_address",
            "'p' AS c_phone", "CAST(id AS DOUBLE) AS c_acctbal",
            "'s' AS c_mktsegment", "'c' AS c_comment"
        ).coalesce(1).write.parquet(f"{d2}/customer.parquet")
        old = pq._SCAN_FLOOR_BYTES
        pq._SCAN_FLOOR_BYTES = 0  # nothing is "tiny" now
        try:
            df2 = pq.load_table(spark, d2, "customer")
            assert df2.rdd.getNumPartitions() < par
        finally:
            pq._SCAN_FLOOR_BYTES = old
    finally:
        pq.enable_cache(was)


def test_file_size_stats_single_evaluation_for_derived_inputs(spark):
    """file_size_stats consumes its input twice (stats pass + median rank
    selection); non-LocalRelation inputs must be lazily checkpointed so the
    upstream pipeline runs once, while LocalRelation inputs skip the
    checkpoint (re-consumption is free, the checkpoint job is not)."""
    from iceberg_meta_spark.operators.file_health import _one_evaluation

    from iceberg_meta_spark.sources.localrel import local_frame

    # the Arrow/pandas path plans as a LocalRelation (the driver-decoded
    # metadata shape); the classic list path plans as LogicalRDD and DOES
    # get checkpointed — both directions asserted
    local = local_frame(spark, [(100,), (200,)], "file_size_in_bytes long")
    assert _one_evaluation(local) is local
    derived = local.groupBy("file_size_in_bytes").count().select("file_size_in_bytes")
    out = _one_evaluation(derived)
    assert out is not derived
    plan = out._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    assert plan == "LogicalRDD"
    # and the stats themselves are unchanged by the materialization
    from iceberg_meta_spark.operators.file_health import file_size_stats

    row = file_size_stats(derived).collect()[0]
    assert row.file_count == 2 and row.median_size == 150.0
