"""Write-audit-publish (iceberg_write.py: commit_append(branch=...) +
fast_forward, api.insert_into(branch=)/api.publish): staged branch
commits invisible to main, atomic metadata-only publish, ancestor-checked
refusal on divergence, tag protection, and no-op fast-forwards.

Reference parity: the reference has no write path at all; semantics
mirror the public engine workflow (spark.wap.branch staging + the
fast_forward procedure, spec § Refs)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_scan import scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    fast_forward,
    manage_ref,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _append(spark, table, ids, ts_off, branch=None):
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in ids], "id long, val long")
        .coalesce(1),
        table, timestamp_ms=_TS + ts_off, branch=branch,
    )


def _version(table):
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        return int(fh.read())


def test_staged_commit_invisible_until_publish(spark):
    table = _fresh("wap_basic")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(1, 6), 60_000)
    _append(spark, table, range(6, 11), 120_000, branch="audit")
    # staged: main readers untouched, branch readers see everything
    assert scan_table(spark, table).count() == 5
    assert scan_table(spark, table, ref="audit").count() == 10
    md = json.load(open(os.path.join(
        table, "metadata", f"v{_version(table)}.metadata.json")))
    assert md["current-snapshot-id"] == 1
    assert md["refs"]["audit"] == {"snapshot-id": 2, "type": "branch"}
    # the staged snapshot's parent is the fork point
    assert next(s for s in md["snapshots"]
                if s["snapshot-id"] == 2)["parent-snapshot-id"] == 1
    # publish: atomic, metadata-only
    res = fast_forward(table, "main", "audit", timestamp_ms=_TS + 180_000)
    assert res == {"updated": True, "from": 1, "to": 2}
    assert scan_table(spark, table).count() == 10
    md2 = json.load(open(os.path.join(
        table, "metadata", f"v{_version(table)}.metadata.json")))
    assert md2["current-snapshot-id"] == 2
    assert md2["snapshot-log"][-1]["snapshot-id"] == 2


def test_staged_chain_publishes_together(spark):
    table = _fresh("wap_chain")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 5), 60_000)
    _append(spark, table, range(5, 10), 120_000, branch="audit")
    _append(spark, table, range(10, 15), 180_000, branch="audit")
    assert scan_table(spark, table).count() == 5
    assert scan_table(spark, table, ref="audit").count() == 15
    fast_forward(table, "main", "audit", timestamp_ms=_TS + 240_000)
    assert scan_table(spark, table).count() == 15


def test_diverged_target_refused(spark):
    table = _fresh("wap_diverge")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 3), 60_000)
    _append(spark, table, range(3, 6), 120_000, branch="audit")
    _append(spark, table, range(6, 9), 180_000)  # main moves on: diverged
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(table, "main", "audit", timestamp_ms=_TS + 240_000)
    # both lines still readable
    assert scan_table(spark, table).count() == 6
    assert scan_table(spark, table, ref="audit").count() == 6


def test_fast_forward_creates_branch_and_noops_when_equal(spark):
    table = _fresh("wap_create")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 3), 60_000)
    _append(spark, table, range(3, 6), 120_000, branch="audit")
    # target branch doesn't exist: created at the source head
    res = fast_forward(table, "release", "audit", timestamp_ms=_TS + 180_000)
    assert res["updated"] and res["from"] is None and res["to"] == 2
    v = _version(table)
    # equal heads: no-op, no new metadata version
    res2 = fast_forward(table, "release", "audit", timestamp_ms=_TS + 240_000)
    assert res2 == {"updated": False, "from": 2, "to": 2}
    assert _version(table) == v


def test_tag_cannot_be_fast_forwarded_or_staged(spark):
    table = _fresh("wap_tag")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 3), 60_000)
    manage_ref(table, "v1.0", ref_type="tag", timestamp_ms=_TS + 120_000)
    with pytest.raises(ValueError, match="is a tag"):
        fast_forward(table, "v1.0", "main", timestamp_ms=_TS + 180_000)
    with pytest.raises(ValueError, match="is a tag"):
        _append(spark, table, range(3, 6), 240_000, branch="v1.0")


def test_api_verbs(spark):
    from iceberg_meta_spark import api

    table = _fresh("wap_api")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 4), 60_000)
    df = spark.createDataFrame([(i, i) for i in range(4, 8)], "id long, val long")
    api.insert_into(spark, df.coalesce(1), table, branch="audit")
    assert api.scan(spark, table).count() == 4
    api.publish(table, "audit", timestamp_ms=_TS + 180_000)
    assert api.scan(spark, table).count() == 8
