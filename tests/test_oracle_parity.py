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


def test_every_query_has_an_oracle_or_is_documented():
    missing = set(_QUERIES) - set(_ORACLES)
    # Only genuinely non-SQL-expressible ops may omit the oracle.
    assert missing == set(), f"queries without oracle: {missing}"


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
