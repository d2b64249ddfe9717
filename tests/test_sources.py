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
    conf = ice.iceberg_session_conf("local", catalog_type="hadoop", warehouse="/tmp/wh")
    assert "spark.sql.catalog.local.uri" not in conf
    assert conf["spark.sql.catalog.local.warehouse"] == "/tmp/wh"


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
