"""The strongest gate: every registered query must hash-match its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.compare import compare_frames, duckdb_connect

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


# Only genuinely non-portable ops may omit the oracle (the driver records
# their weaker rows-only check). Since round 7 this is the REGISTRY's
# tolerance_twin contract, not a hand-maintained list: every oracle-less
# query must declare its exact twin (test_every_query_is_oracle_or_twin_gated
# below enforces twin existence, twin oracle, and a check_oracle gate).
def _rows_only() -> set[str]:
    from iceberg_meta_spark.registry import load_all

    return {n for n, spec in load_all().items() if spec.tolerance_twin is not None}


def test_every_query_has_an_oracle_or_is_documented():
    rows_only = _rows_only()
    missing = set(_QUERIES) - set(_ORACLES) - rows_only
    assert missing == set(), f"queries without oracle: {missing}"
    assert rows_only <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        pytest.skip("rows-only query")
    ddf = duck.execute(_ORACLES[name]).df()
    res = compare_frames(name, sdf, ddf)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"section", "metric", "value"}


def test_registry_binds_each_name_to_its_own_function():
    """Guard against decorator stacking: inserting a new @register+def pair
    between an existing decorator and its def silently rebinds the existing
    name to the WRONG function (it keeps working, with the wrong columns).
    Convention: the registered function is named after the query (a ``_q``
    suffix is allowed for name-collision avoidance)."""
    from iceberg_meta_spark.registry import load_all

    for name, spec in load_all().items():
        fn = spec.spark_fn.__name__
        assert fn in (name, f"{name}_q"), f"{name!r} bound to function {fn!r}"


def test_comparator_is_dtype_strict():
    """Round-4 regression (VERDICT r4 #2): the driver's value hash is
    dtype-sensitive, so the local mirror must fail an int-vs-float column
    pair even when every value is numerically equal (2 vs 2.0 — the exact
    shape of the meta_compaction_plan HUGEINT// bug)."""
    import pandas as pd

    ints = pd.DataFrame({"g": [1, 2, 3]})
    floats = pd.DataFrame({"g": [1.0, 2.0, 3.0]})
    res = compare_frames("int_vs_float", ints, floats)
    assert not res.ok and "dtype" in res.detail, str(res)

    # object-dtype columns (nullable paths) are judged per-value
    obj_int = pd.DataFrame({"g": pd.Series([2, None], dtype=object)})
    obj_float = pd.DataFrame({"g": pd.Series([2.0, None], dtype=object)})
    res = compare_frames("obj_int_vs_float", obj_int, obj_float)
    assert not res.ok and "dtype" in res.detail, str(res)

    # identical dtypes still pass, including canonical row-order sorting
    a = pd.DataFrame({"g": [3, 1, 2]})
    b = pd.DataFrame({"g": [1, 2, 3]})
    assert compare_frames("same_ints", a, b).ok


def test_driver_window_is_first_50_and_fully_oracle_gated():
    """The driver's correctness gate checks the first 50 registrations; the
    curated DRIVER_WINDOW must come first, intact, and every window query
    must carry a full DuckDB hash oracle (no rows-only slot wasted)."""
    from iceberg_meta_spark.registry import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert list(_QUERIES)[:50] == DRIVER_WINDOW
    assert set(DRIVER_WINDOW) <= set(_ORACLES)


def test_every_query_is_oracle_or_twin_gated():
    """Registry contract (round-7, VERDICT r6 #7): every registered query
    carries either a DuckDB hash oracle or a tolerance_twin naming the exact
    query whose oracle supplies ground truth — a new approximate query can't
    silently ship ungated. Every declared twin must itself exist, be
    oracle-gated, and have a comparator gate in tools/check_oracle.py."""
    from iceberg_meta_spark.registry import load_all
    from tools.check_oracle import SKETCH_GATES

    specs = load_all()
    for name, spec in specs.items():
        assert spec.oracle is not None or spec.tolerance_twin is not None, (
            f"{name} has neither an oracle nor a tolerance_twin"
        )
        if spec.tolerance_twin is not None:
            assert spec.oracle is None, f"{name} has both oracle and twin"
            twin = specs.get(spec.tolerance_twin)
            assert twin is not None, f"{name}: twin {spec.tolerance_twin} not registered"
            assert twin.oracle is not None, f"{name}: twin {twin.name} has no oracle"
            assert name in SKETCH_GATES, f"{name}: no comparator gate in check_oracle.py"
    # and no gate may point at a query that no longer declares a twin
    for name in SKETCH_GATES:
        assert specs[name].tolerance_twin is not None, (
            f"SKETCH_GATES[{name!r}] has no registry-side tolerance_twin"
        )


def test_every_registered_query_has_a_scaling_row():
    """Standing rule (VERDICT r6 #8): no registered query without a scale
    exponent — every registry name must appear as a SCALING.md table row,
    so a new query can't ship unmeasured."""
    import re

    rows = set()
    for line in open("/root/repo/SCALING.md"):
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|", line)
        if m:
            rows.add(m.group(1))
    from iceberg_meta_spark.registry import load_all

    missing = sorted(set(load_all()) - rows)
    assert missing == [], f"queries without a SCALING.md row: {missing}"
