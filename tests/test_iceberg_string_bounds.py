"""String zone-map bounds (iceberg_write.py: truncate_lower_bound /
truncate_upper_bound + write_dataframe_files string stats; spec Appendix
D metrics truncation): bound truncation safety, write -> plan -> prune
round trip, and the conservative-keep property for long shared prefixes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    truncate_lower_bound,
    truncate_upper_bound,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


# ------------------------------------------------------------- truncation
def test_truncate_bounds_units():
    assert truncate_lower_bound("short") == "short"
    assert truncate_lower_bound("x" * 40) == "x" * 16
    assert truncate_upper_bound("short") == "short"
    # upper: truncate THEN increment the last codepoint
    assert truncate_upper_bound("a" * 40) == "a" * 15 + "b"
    # last codepoint at the ceiling: walk left
    assert truncate_upper_bound("a" * 15 + "\U0010FFFF" + "zz") \
        == "a" * 14 + "b"
    # every codepoint at the ceiling: no valid bound -> omitted
    assert truncate_upper_bound("\U0010FFFF" * 20) is None


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.text(min_size=0, max_size=40))
def test_truncated_bounds_bracket_the_value(s):
    """The safety property pruning relies on: lower <= s <= upper."""
    assert truncate_lower_bound(s) <= s
    up = truncate_upper_bound(s)
    if up is not None:
        assert s <= up


# ------------------------------------------------------- write/scan round
def test_string_predicate_prunes_disjoint_files(spark):
    from iceberg_meta_spark.sources.iceberg_fixture import (
        default_string_bounds_table,
    )

    table = default_string_bounds_table(spark)
    plan = plan_scan(spark, table, predicate=("region", "emea", "emea"))
    assert plan.files_total == 3 and plan.files_pruned == 2
    df = scan_table(spark, table, predicate=("region", "emea", "emea"))
    assert sorted(r.id for r in df.collect()) == [5, 6, 7, 8, 9]


def test_long_shared_prefix_never_prunes_matching_file(spark):
    """20-char strings sharing a 16-char prefix: the truncated bounds
    collapse to the same window, and a predicate INSIDE the real range
    must keep the file (the incremented upper bound guarantees it)."""
    table = _fresh("strb_prefix")
    create_table(table, fields=[(1, "code", "string"), (2, "id", "long")])
    prefix = "p" * 16
    rows = [(prefix + suf, i) for i, suf in enumerate(("aaaa", "mmmm", "zzzz"))]
    append_dataframe(
        spark, spark.createDataFrame(rows, "code string, id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    target = prefix + "mmmm"
    plan = plan_scan(spark, table, predicate=("code", target, target))
    assert plan.files_pruned == 0  # conservative: truncation keeps the file
    got = scan_table(spark, table, predicate=("code", target, target)).collect()
    assert [r.id for r in got] == [1]
    # and a predicate clearly ABOVE the incremented upper bound prunes
    plan2 = plan_scan(spark, table, predicate=("code", "q", "r"))
    assert plan2.files_pruned == 1


def test_string_bounds_recorded_truncated(spark):
    import json

    from iceberg_meta_spark.sources.iceberg_native import decode_bound
    from iceberg_meta_spark.sources.avro_py import read_container

    table = _fresh("strb_truncated")
    create_table(table, fields=[(1, "code", "string"), (2, "id", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([("a" * 40, 1), ("b" * 40, 2)],
                              "code string, id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    meta = os.path.join(table, "metadata")
    md = json.load(open(os.path.join(meta, "v2.metadata.json")))
    snap = md["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as fh:
        _, _, mlist = read_container(fh.read())
    with open(mlist[0]["manifest_path"], "rb") as fh:
        _, _, entries = read_container(fh.read())
    dfile = entries[0]["data_file"]
    lb = {int(kv["key"]): kv["value"] for kv in dfile["lower_bounds"]}
    ub = {int(kv["key"]): kv["value"] for kv in dfile["upper_bounds"]}
    assert decode_bound(bytes(lb[1]), "string") == "a" * 16
    assert decode_bound(bytes(ub[1]), "string") == "b" * 15 + "c"


def test_upper_bound_skips_surrogate_block():
    """Incrementing into U+D800..U+DFFF would create a lone surrogate that
    UTF-8 cannot encode (the commit would crash); the increment jumps to
    U+E000, which is still a valid upper bound."""
    s = "a" * 15 + chr(0xD7FF)  # 16th codepoint = last before surrogates
    up = truncate_upper_bound(s + "zzz")
    assert up == "a" * 15 + chr(0xE000)
    assert s + "zzz" <= up
    up.encode("utf-8")  # must be encodable
