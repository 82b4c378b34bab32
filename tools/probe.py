#!/usr/bin/env python3
"""Probe DuckDB result column names/types + first rows for an oracle SQL.

Usage: python3 tools/probe.py <sfDir> < query.sql
       python3 tools/probe.py <sfDir> "SELECT ..." ["SELECT ..." ...]

Dev-harness only (driver-side python), never imported by the engine.
"""
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    sqls = sys.argv[2:] or [sys.stdin.read()]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for sql in sqls:
        try:
            rel = con.sql(sql)
            print([(c, str(t)) for c, t in zip(rel.columns, rel.types)])
            rows = rel.fetchall()
            print(f"rows={len(rows)}")
            for r in rows[:5]:
                print(" ", r)
        except Exception as e:
            print(f"FAIL: {e}")
        print("---")


if __name__ == "__main__":
    main()
