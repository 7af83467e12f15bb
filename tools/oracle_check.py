#!/usr/bin/env python3
"""Run every oracle-checked query at an arbitrary sf dir and compare Spark vs
DuckDB exactly (the driver does this at sf0.01; this catches scale-dependent
drift at other sfs before it ships). Usage:

    python tools/oracle_check.py [/root/testdata/sf0.1] [name_substring]

An optional second arg filters to queries whose name contains the
substring (fast single-query iteration while developing an oracle).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import duckdb

    import __spark_entry__ as em
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    only = sys.argv[2] if len(sys.argv) > 2 else ""
    failures = 0
    for name in sorted(em.oracle_sql()):
        if only and only not in name:
            continue
        try:
            sdf = em.queries()[name](spark, sf_dir)
            cols = sdf.columns
            srows = sdf.collect()
            res = con.execute(em.oracle_sql()[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            assert sorted(cols) == sorted(dcols), (cols, dcols)
            assert len(srows) == len(drows), (len(srows), len(drows))
            so = [cols.index(c) for c in sorted(cols)]
            do = [dcols.index(c) for c in sorted(dcols)]
            a = sorted(tuple(norm(r[i]) for i in so) for r in srows)
            b = sorted(tuple(norm(r[i]) for i in do) for r in drows)
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            assert not bad, bad[:2]
            print(f"OK   {name}: {len(srows)} rows")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {str(e)[:300]}")
    spark.stop()
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
