"""Mimics the driver's verification: entry() smoke + Spark-vs-DuckDB parity
for every SQL-checked registry entry (same compare semantics: row count +
column names + order-insensitive values)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nise_dedup.queries import REGISTRY
from parity import compare, duck_connection

SF = "/root/testdata/sf0.001"
SQL_CHECKED = [n for n, (_f, s) in REGISTRY.items() if s is not None]
ROWS_ONLY = [n for n, (_f, s) in REGISTRY.items() if s is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500            # one row per sf0.001 document
    cols = set(df.columns)
    assert {"repo", "path", "commit", "lang",
            "content_sha256", "cluster_id"} <= cols
    # dedup actually found something: fewer clusters than rows
    assert len({r["cluster_id"] for r in rows}) < len(rows)


def test_contract_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_parity(spark, duck, name):
    fn, sql = REGISTRY[name]
    r = compare(fn(spark, SF), duck, sql)
    assert r["ok"], r["detail"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF)
    assert df.count() >= 0
    assert df.schema  # stable schema
