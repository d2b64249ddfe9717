"""Partition transforms (sources/iceberg_transforms.py): hash pins from
the public Iceberg spec (Appendix B), transform algebra, predicate
projection, and the write -> Hive layout -> manifest tuple -> projected
prune -> scan round trip for bucket / month / truncate tables.

Reference parity: the reference only READS partition tuples (its
formatters roll up whatever pyiceberg planned); the transform algebra
itself comes from the Apache Iceberg spec, § Partition Transforms and
Appendix B (bucket hash requirements)."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_meta_spark.sources.iceberg_transforms import (
    _mm3_long_numpy,
    apply_value,
    bucket_value,
    iceberg_hash_long,
    iceberg_hash_string,
    murmur3_x86_32,
    parse_transform,
    project_range,
    result_avro_type,
)


# ---------------------------------------------------------------- hashes
def test_murmur3_reference_vectors():
    # general murmur3_x86_32 vectors, seed 0
    assert murmur3_x86_32(b"") == 0
    assert murmur3_x86_32(b"hello") == 0x248BFA47


def test_spec_appendix_b_bucket_hash_pins():
    # Iceberg spec Appendix B "Bucket transform requirements" examples
    assert iceberg_hash_long(34) == 2017239379          # int and long 34
    assert iceberg_hash_long(17486) == -653330422       # date 2017-11-16
    assert iceberg_hash_string("iceberg") == 1210000089


def test_bucket_value_matches_java_semantics():
    # (hash & Integer.MAX_VALUE) % N, on the SIGNED hash
    assert bucket_value(34, "int", 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_value(17486, "date", 8) == ((-653330422) & 0x7FFFFFFF) % 8
    assert bucket_value(datetime.date(2017, 11, 16), "date", 8) == \
        bucket_value(17486, "date", 8)
    assert bucket_value(None, "long", 4) is None


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_numpy_kernel_matches_scalar_murmur3(vals):
    import numpy as np

    vec = [int(x) for x in _mm3_long_numpy(np.array(vals, dtype=np.int64))]
    assert vec == [iceberg_hash_long(v) for v in vals]


# ------------------------------------------------------------ transforms
def test_parse_transform():
    assert parse_transform("bucket[16]") == ("bucket", 16)
    assert parse_transform("truncate[10]") == ("truncate", 10)
    assert parse_transform("day") == ("day", None)
    with pytest.raises(ValueError):
        parse_transform("zorder[2]")


def test_truncate_floors_negatives():
    assert apply_value("truncate[10]", 17, "long") == 10
    assert apply_value("truncate[10]", -1, "long") == -10
    assert apply_value("truncate[10]", -10, "long") == -10
    assert apply_value("truncate[3]", "iceberg", "string") == "ice"


def test_temporal_transforms_epoch_relative():
    d = datetime.date(2024, 3, 15)
    assert apply_value("year", d, "date") == 54
    assert apply_value("month", d, "date") == 54 * 12 + 2
    assert apply_value("day", d, "date") == (d - datetime.date(1970, 1, 1)).days
    # pre-epoch dates go negative (spec: ordinals from 1970, signed)
    assert apply_value("day", datetime.date(1969, 12, 31), "date") == -1
    assert apply_value("month", datetime.date(1969, 12, 31), "date") == -1
    ts = datetime.datetime(1970, 1, 2, 3, 0, tzinfo=datetime.timezone.utc)
    assert apply_value("hour", ts, "timestamp") == 27


def test_void_and_identity():
    assert apply_value("void", 42, "long") is None
    assert apply_value("identity", 42, "long") == 42


def test_result_avro_types():
    assert result_avro_type("bucket[4]", "long") == "int"
    assert result_avro_type("month", "date") == "int"
    assert result_avro_type("truncate[10]", "long") == "long"
    assert result_avro_type("truncate[2]", "string") == "string"
    assert result_avro_type("identity", "string") == "string"


# ------------------------------------------------------------ projection
def test_project_range_monotonic_transforms():
    lo, hi = datetime.date(2024, 3, 10), datetime.date(2024, 5, 20)
    assert project_range("month", lo, hi, "date") == (650, 652)
    assert project_range("truncate[10]", 13, 27, "long") == (10, 20)
    assert project_range("identity", "a", "m", "string") == ("a", "m")
    # open ends stay open
    assert project_range("truncate[10]", None, 27, "long") == (None, 20)


def test_project_range_bucket_equality_only():
    assert project_range("bucket[4]", 17, 17, "long") == (3, 3)
    assert project_range("bucket[4]", 1, 5, "long") is None   # range: no prune
    assert project_range("bucket[4]", None, 5, "long") is None
    assert project_range("void", 1, 5, "long") is None


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.integers(min_value=-(10**12), max_value=10**12),
       st.integers(min_value=0, max_value=10**6))
def test_projection_is_conservative_for_truncate(lo, width):
    """Every v in [lo, hi] has transform(v) inside the projected interval
    — the property that makes projected pruning SAFE."""
    hi = lo + width
    plo, phi = project_range("truncate[100]", lo, hi, "long")
    for v in (lo, hi, (lo + hi) // 2):
        t = apply_value("truncate[100]", v, "long")
        assert plo <= t <= phi


# ---------------------------------------------------- write/scan round trip
def _fresh(name: str) -> None:
    shutil.rmtree(os.path.join(tempfile.gettempdir(), name), ignore_errors=True)


def test_bucket_table_prunes_to_one_file(spark):
    from iceberg_meta_spark.sources.iceberg_fixture import default_bucket_table
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table

    table = default_bucket_table(spark)
    plan = plan_scan(spark, table, predicate=("id", 17, 17))
    assert plan.files_total == 4 and plan.files_pruned == 3
    assert [tuple(r) for r in
            scan_table(spark, table, predicate=("id", 17, 17)).collect()] \
        == [(17, 119)]
    # a RANGE predicate cannot project through bucket: nothing pruned,
    # result still exact via the residual filter
    plan2 = plan_scan(spark, table, predicate=("id", 16, 18))
    rows = scan_table(spark, table, predicate=("id", 16, 18)).orderBy("id")
    assert [r.id for r in rows.collect()] == [16, 17, 18]
    assert plan2.files_total == 4


def test_temporal_table_prunes_by_projected_months(spark):
    from iceberg_meta_spark.sources.iceberg_fixture import default_temporal_table
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table

    table = default_temporal_table(spark)
    pred = ("event_date", datetime.date(2024, 3, 10), datetime.date(2024, 5, 20))
    plan = plan_scan(spark, table, predicate=pred)
    assert plan.files_total == 12 and plan.files_pruned == 9
    got = [(str(r.event_date), r.id) for r in
           scan_table(spark, table, predicate=pred).orderBy("id").collect()]
    assert got == [("2024-03-20", 6), ("2024-04-05", 7), ("2024-04-20", 8),
                   ("2024-05-05", 9), ("2024-05-20", 10)]


def test_truncate_table_residual_filter_trims_boundaries(spark):
    from iceberg_meta_spark.sources.iceberg_fixture import default_truncate_table
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table

    table = default_truncate_table(spark)
    plan = plan_scan(spark, table, predicate=("id", 13, 27))
    assert plan.files_total == 4 and plan.files_pruned == 2
    df = scan_table(spark, table, predicate=("id", 13, 27))
    assert df.count() == 15
    assert df.agg({"val": "sum"}).collect()[0][0] == 900


def test_manifest_partition_tuple_carries_transformed_values(spark):
    """The bucket value rides the manifest entry (field name = spec field
    name, Avro int), where the planner's projected prune reads it."""
    from iceberg_meta_spark.sources.iceberg_fixture import default_bucket_table
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan

    table = default_bucket_table(spark)
    plan = plan_scan(spark, table)
    parts = sorted(f["part"]["id_bucket"] for f in plan.data_files)
    assert parts == [0, 1, 2, 3]


def test_partition_evolution_with_transform(spark):
    """evolve to bucket[2](id): old files keep their (empty) spec shape and
    are conservatively kept by the projected prune; new files prune."""
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_partition_spec,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_tx_evolve_v1")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(i, i) for i in range(4)],
                                     "id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 60_000)
    update_partition_spec(table, add_fields=[("id_bucket", "bucket[2]", "id")],
                          timestamp_ms=1713139200000 + 120_000)
    append_dataframe(
        spark, spark.createDataFrame([(i, i) for i in range(4, 8)],
                                     "id long, val long").coalesce(1),
        table, timestamp_ms=1713139200000 + 180_000)
    assert scan_table(spark, table).count() == 8
    plan = plan_scan(spark, table, predicate=("id", 6, 6))
    # transformed-partition pruning LAYERS with the zone-map prune: the
    # wrong-bucket post-evolution file is pruned by the projected bucket
    # value, and the pre-evolution file (no id_bucket key -> conservatively
    # kept by the partition prune) is pruned by its id bounds [0, 3]
    assert plan.files_pruned == 2 and len(plan.data_files) == 1
    got = scan_table(spark, table, predicate=("id", 6, 6)).collect()
    assert [tuple(r) for r in got] == [(6, 6)]
    # and where the bounds DO cover the value, the old file is kept
    plan2 = plan_scan(spark, table, predicate=("id", 2, 2))
    assert any("commit-00002" in f["path"] for f in plan2.data_files)
    assert [tuple(r) for r in
            scan_table(spark, table, predicate=("id", 2, 2)).collect()] \
        == [(2, 2)]


def test_update_spec_rejects_duplicate_source_transform(spark):
    from iceberg_meta_spark.sources.iceberg_write import (
        create_table,
        update_partition_spec,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_tx_dup_v1")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long")],
                 partition_fields=[("id_bucket", 1, 1000, "bucket[4]")])
    with pytest.raises(ValueError, match="already partitions"):
        update_partition_spec(table,
                              add_fields=[("b2", "bucket[4]", "id")],
                              timestamp_ms=1713139200000 + 60_000)
    # same source, DIFFERENT transform is legal (bucket + truncate)
    update_partition_spec(table,
                          add_fields=[("id_trunc", "truncate[10]", "id")],
                          timestamp_ms=1713139200000 + 120_000)


def test_create_table_rejects_unknown_transform():
    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_tx_bad_v1")
    shutil.rmtree(base, ignore_errors=True)
    with pytest.raises(ValueError, match="unknown partition transform"):
        create_table(os.path.join(base, "t"), fields=[(1, "id", "long")],
                     partition_fields=[("z", 1, 1000, "zorder[2]")])


def test_unsupported_transform_type_pairs_fail_at_ddl_time():
    from iceberg_meta_spark.sources.iceberg_write import (
        create_table,
        update_partition_spec,
    )

    base = os.path.join(tempfile.gettempdir(), "iceberg_meta_tx_ddl_v1")
    shutil.rmtree(base, ignore_errors=True)
    t1 = os.path.join(base, "t1")
    # identity on date: rejected with guidance toward day()
    with pytest.raises(ValueError, match="day\\(col\\) instead"):
        create_table(t1, fields=[(1, "d", "date")],
                     partition_fields=[("d", 1, 1000)])
    # truncate on date: rejected
    with pytest.raises(ValueError, match="truncate unsupported"):
        create_table(t1, fields=[(1, "d", "date")],
                     partition_fields=[("dt", 1, 1000, "truncate[4]")])
    # evolution path validates the same way
    create_table(t1, fields=[(1, "d", "date"), (2, "id", "long")])
    with pytest.raises(ValueError, match="day\\(col\\) instead"):
        update_partition_spec(t1, add_identity=["d"],
                              timestamp_ms=1713139200000 + 60_000)
    # the guided alternative works
    update_partition_spec(t1, add_fields=[("d_day", "day", "d")],
                          timestamp_ms=1713139200000 + 120_000)


def test_bucket_exact_for_huge_nullable_longs(spark):
    """A null in a long Arrow batch must not demote the batch to float64:
    ids near 2^63 hash EXACTLY (the null-coalesce + outer when keeps the
    batch int64), and null keys get a null partition value."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.iceberg_transforms import (
        bucket_value,
        spark_expr,
    )

    big = 9_223_372_036_854_775_783  # near 2^63, unrepresentable in float64
    df = spark.createDataFrame([(big,), (None,), (34,)], "id long")
    got = [r.b for r in
           df.select(spark_expr("bucket[16]", "id", "long").alias("b"))
           .collect()]
    assert got == [bucket_value(big, "long", 16), None,
                   bucket_value(34, "long", 16)]


def test_transform_ddl_validation_covers_bucket_and_temporal():
    from iceberg_meta_spark.sources.iceberg_transforms import (
        parse_transform,
        result_avro_type,
    )

    with pytest.raises(ValueError, match="bucket unsupported"):
        result_avro_type("bucket[4]", "double")
    with pytest.raises(ValueError, match="date/timestamp"):
        result_avro_type("month", "long")
    with pytest.raises(ValueError, match="timestamp column"):
        result_avro_type("hour", "date")
    with pytest.raises(ValueError, match="width must be >= 1"):
        parse_transform("bucket[0]")
    with pytest.raises(ValueError, match="width must be >= 1"):
        parse_transform("truncate[0]")


def test_temporal_spark_exprs_are_utc_under_any_session_timezone(spark):
    """ADVICE r9: year/month/day/hour over TIMESTAMP sources must compute
    from the instant's UTC calendar, not the session timezone — otherwise
    written partition values and apply_value's scan-time projection
    diverge and pruning can drop matching rows. Pin: under a non-UTC
    session every transform equals apply_value's UTC result."""
    import datetime as _dt

    from iceberg_meta_spark.sources.iceberg_transforms import spark_expr

    # 2024-03-01 03:30 UTC renders as 2024-02-29 19:30 in LA: year/month/
    # day ALL differ between the two timezones, so a session-tz leak flips
    # every assertion below
    ts = _dt.datetime(2024, 3, 1, 3, 30, tzinfo=_dt.timezone.utc)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        df = spark.createDataFrame([(ts,)], "ts timestamp")
        row = df.select(
            *[
                spark_expr(k, "ts", "timestamp").alias(k)
                for k in ("year", "month", "day", "hour")
            ]
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    for k in ("year", "month", "day", "hour"):
        assert row[k] == apply_value(k, ts, "timestamp"), k


def test_partition_field_name_collision_rejected_at_ddl_time():
    """ADVICE r9 (medium): a transformed partition field named after a
    schema column would make write_dataframe_files' withColumn silently
    REPLACE the data column and partitionBy drop its real values — reject
    at CREATE/ALTER time like Iceberg's name-conflict validation."""
    import tempfile as _tf
    import shutil as _sh
    import os as _os

    from iceberg_meta_spark.sources.iceberg_write import (
        create_table,
        update_partition_spec,
    )

    base = _os.path.join(_tf.gettempdir(), "pf_name_collision")
    _sh.rmtree(base, ignore_errors=True)

    # transformed field shadowing a column: rejected
    with pytest.raises(ValueError, match="conflicts with schema column"):
        create_table(
            _os.path.join(base, "t1"),
            fields=[(1, "id", "long"), (2, "val", "long")],
            partition_fields=[("val", 1, 1000, "bucket[4]")],
        )
    # two partition fields sharing a name: rejected
    with pytest.raises(ValueError, match="another partition field"):
        create_table(
            _os.path.join(base, "t2"),
            fields=[(1, "id", "long"), (2, "val", "long")],
            partition_fields=[
                ("b", 1, 1000, "bucket[4]"),
                ("b", 2, 1001, "bucket[8]"),
            ],
        )
    # the one legal overlap: identity named after its own source
    create_table(
        _os.path.join(base, "t3"),
        fields=[(1, "region", "string"), (2, "id", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    # ALTER path: same rules
    with pytest.raises(ValueError, match="conflicts with schema column"):
        update_partition_spec(
            _os.path.join(base, "t3"),
            add_fields=[("id", "bucket[4]", "id")],
            timestamp_ms=1713139200000 + 60_000,
        )
    with pytest.raises(ValueError, match="another partition field"):
        update_partition_spec(
            _os.path.join(base, "t3"),
            add_fields=[("region", "bucket[4]", "id")],
            timestamp_ms=1713139200000 + 60_000,
        )


def test_part_from_path_ignores_table_root_hive_segments(spark):
    """ADVICE r9: a table ROOTED under a directory containing a
    'col=value' segment must parse partition values from the innermost
    (write-produced) Hive dir, not the table-root segment."""
    import shutil as _sh
    import tempfile as _tf

    from iceberg_meta_spark.sources.avro_py import read_container
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(_tf.gettempdir(), "pfp_root", "region=us", "tables")
    _sh.rmtree(os.path.join(_tf.gettempdir(), "pfp_root"), ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    rows = [("emea", 1), ("apac", 2)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "region string, id long").coalesce(1),
        table,
        timestamp_ms=1713139200000 + 60_000,
    )
    # manifest partition tuples record the WRITTEN values, never 'us'
    import glob as _glob
    import json as _json

    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    md = _json.load(
        open(os.path.join(table, "metadata", f"v{v}.metadata.json"))
    )
    snap = md["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as fh:
        _, _, manifests = read_container(fh.read())
    parts = set()
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            _, _, entries = read_container(fh.read())
        parts.update(e["data_file"]["partition"]["region"] for e in entries)
    assert parts == {"emea", "apac"}
    got = sorted((r.region, r.id) for r in scan_table(spark, table).collect())
    assert got == [("apac", 2), ("emea", 1)]
