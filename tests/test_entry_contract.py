"""Driver-contract conformance: mimic the verify harness -- run entry(),
every queries() entry at sf0.01, and compare each oracle-checked query
against DuckDB exactly (row count + column names + sorted values)."""

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.schema is not None


def test_all_queries_run(spark):
    qs = entry_mod.queries()
    assert len(qs) >= 10
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        # every query must be deterministic across two runs
        assert df.count() == n, name


def test_resync_sweep_monotone(spark):
    """Edit-robustness curve (resync.go headline): shared% must decay
    monotonically with edit count and stay high at 1 edit (each edit
    invalidates O(1) chunks of ~100 per clip)."""
    df = entry_mod.queries()["cdc_resync_sweep"](spark, SF_DIR)
    rows = sorted(df.collect(), key=lambda r: r["n_edits"])
    assert [r["n_edits"] for r in rows] == [1, 4, 16, 64]
    pcts = [r["shared_pct"] for r in rows]
    assert all(0.0 <= p <= 1.0 for p in pcts)
    assert pcts[0] >= 0.9, pcts
    for a, b in zip(pcts, pcts[1:]):
        assert b < a, pcts


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_parity(spark, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = _duck(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), name

    order = [spark_cols.index(c) for c in sorted(spark_cols)]
    dorder = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        tuple(_norm(r[i]) for i in order) for r in spark_rows
    )
    d_sorted = sorted(
        tuple(_norm(r[i]) for i in dorder) for r in duck_rows
    )
    for a, b in zip(s_sorted, d_sorted):
        assert a == b, (name, a, b)
