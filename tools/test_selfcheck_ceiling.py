#!/usr/bin/env python3
"""Repeatable proof that selfcheck's hard oracle-lap ceiling trips.

Fabricates a verify-out dir with one deliberately slow oracle (a
cross-range count far beyond any real compare) plus one fast oracle,
runs tools/selfcheck.py with a 2-second ceiling, and asserts:
  - exit code is non-zero,
  - the slow query is named ORACLE-TOO-SLOW,
  - the fast query AFTER it still compares OK (the interrupt leaves
    the DuckDB connection usable).

Usage: python3 tools/test_selfcheck_ceiling.py <sfDir>
Dev-harness only (driver-side python), never imported by the engine.
"""
import json
import pathlib
import subprocess
import sys
import tempfile

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory(prefix="lapceil") as tmp:
        out = pathlib.Path(tmp) / "out"
        (out / "slow_q").mkdir(parents=True)
        (out / "zz_fast").mkdir()
        duckdb.sql("COPY (SELECT 1 AS x) TO "
                   f"'{out}/slow_q/part.parquet' (FORMAT PARQUET)")
        duckdb.sql("COPY (SELECT 7 AS y) TO "
                   f"'{out}/zz_fast/part.parquet' (FORMAT PARQUET)")
        (out / "oracle_sql.json").write_text(json.dumps({
            "slow_q": "SELECT CAST(count(*) AS INT) AS x "
                      "FROM range(1000000) a, range(1000000) b",
            "zz_fast": "SELECT 7 AS y",
        }))
        (out / "queries.json").write_text(json.dumps(["slow_q", "zz_fast"]))
        here = pathlib.Path(__file__).resolve().parent
        r = subprocess.run(
            [sys.executable, str(here / "selfcheck.py"), sf_dir, str(out)],
            env={"GRAFT_ORACLE_LAP_CEILING": "2", "PATH": "/usr/bin:/bin"},
            capture_output=True, text=True, timeout=120)
        assert r.returncode != 0, f"expected non-zero exit, got {r.returncode}"
        assert "ORACLE-TOO-SLOW" in r.stdout and "slow_q" in r.stdout, \
            f"slow oracle not named:\n{r.stdout}"
        assert "zz_fast  OK exact" in r.stdout, \
            f"connection unusable after interrupt:\n{r.stdout}"
        print("ceiling test PASSED: slow oracle aborted, named, "
              "and the connection survived")


if __name__ == "__main__":
    main()
