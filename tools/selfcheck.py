#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same parquet tables, and compares:
  - schema: sorted column-name lists equal AND the DuckDB-normalized
    column TYPES equal (the driver hash is type-sensitive — a Spark
    DECIMAL(20,2) vs DuckDB DECIMAL(38,2) fails even when values match)
  - rows:   row counts equal
  - hash:   cell-by-cell equality after sorting columns by name and rows
            by all columns (non-float cells first in the sort key so
            tolerance-equal floats can't shuffle row order; exact for
            non-floats; floats exact + a tolerance fallback reported
            separately so we know when we are relying on luck).

Coverage rules (driver parity):
  - every oracle_sql.json key must have an output dir (MISSING-OUTPUT
    fails) — a query that crashed in graft.Verify is a failure;
  - rows-only (no-oracle) queries fail on 0 rows;
  - a CLI query filter that matches nothing is an error.

This tool is dev-harness only (driver-side python), never imported by
the engine.
"""
import json
import math
import os
import sys
import threading
import time
from pathlib import Path

import duckdb

# Hard per-oracle wall-clock ceiling (seconds). An intractable oracle
# must FAIL LOUDLY naming the query, never hang the driver compare (the
# r13 failure mode: one exponential CTE emptied the whole artifact).
# The full 350-query compare runs ~1 min at sf0.01, so 30 s for a
# single oracle is already pathological. Override for tests via env.
LAP_CEILING = float(os.environ.get("GRAFT_ORACLE_LAP_CEILING", "30"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical comparable form of a cell."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    # Decimal, int, str, datetime, date, bool, lists
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return ("v", str(v))


def sort_key(row):
    """Row sort key: non-float cells verbatim, floats rounded so that
    tolerance-equal values land in the same position on both sides."""
    non_float = tuple(c for c in row if c[0] != "f")
    floats = tuple(("f", round(c[1], 6)) for c in row if c[0] == "f")
    return (non_float, floats)


def cells_equal(a, b):
    if a == b:
        return True, True
    # tolerance fallback for floats (exact=False)
    if a[0] == "f" and b[0] == "f":
        x, y = a[1], b[1]
        if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
            return True, False
    if a[0] == "f" and b[0] == "v" or a[0] == "v" and b[0] == "f":
        try:
            x = float(a[1]) if a[0] == "f" else float(str(a[1]))
            y = float(b[1]) if b[0] == "f" else float(str(b[1]))
            if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return True, False
        except (ValueError, TypeError):
            pass
    return False, False


def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    types_sorted = [types[i] for i in order]
    out = sorted((tuple(canon(r[i]) for i in order) for r in rows),
                 key=sort_key)
    return cols_sorted, types_sorted, out


class OracleTimeout(Exception):
    pass


def fetch_sorted_deadline(con, sql, ceiling):
    """fetch_sorted with a hard wall-clock ceiling: a watchdog thread
    interrupts the running DuckDB query at the deadline (duckdb releases
    the GIL while executing, so the watchdog runs; interrupt() aborts
    the query and leaves the connection usable for the next oracle)."""
    timed_out = threading.Event()

    def watchdog():
        if not done.wait(ceiling):
            timed_out.set()
            con.interrupt()

    done = threading.Event()
    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    completed = False
    try:
        result = fetch_sorted(con, sql)
        completed = True
        return result
    except Exception:
        if timed_out.is_set():
            raise OracleTimeout()
        raise
    finally:
        done.set()
        w.join()
        # a query finishing exactly AT the ceiling keeps its valid
        # result; only an actually-aborted fetch reports ORACLE-TOO-SLOW
        if timed_out.is_set() and not completed:
            raise OracleTimeout()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    out_names = set(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    # coverage baseline is the REGISTRY manifest, not the output dirs: a
    # rows-only query that crashed in Verify leaves no output dir AND no
    # oracle key, and would otherwise silently vanish from the check
    manifest_path = Path(out_dir) / "queries.json"
    manifest = (set(json.loads(manifest_path.read_text()))
                if manifest_path.exists() else set())
    orphan_oracles = set(oracle) - manifest if manifest else set()
    names = sorted(out_names | set(oracle) | manifest)
    if only:
        unknown = only - set(names)
        if unknown:
            print(f"ERROR: query filter matched nothing: {sorted(unknown)}")
            sys.exit(2)
        names = [n for n in names if n in only]
    times = {}
    _lap = [None, 0.0]
    for name in names:
        _now = time.monotonic()
        if _lap[0] is not None:
            times[_lap[0]] = _now - _lap[1]
        _lap = [name, _now]
        if name in orphan_oracles:
            results[name] = "ORACLE-WITHOUT-QUERY (oracle_sql key not in registry)"
            continue
        if name not in out_names:
            results[name] = "MISSING-OUTPUT (query crashed in graft.Verify?)"
            continue
        got_path = Path(out_dir) / name
        try:
            gcols, gtypes, grows = fetch_sorted(
                con, f"SELECT * FROM read_parquet('{got_path}/*.parquet')")
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            # degenerate-output guards: 0 rows, 0 columns, or all-null
            # rows are failures — "it produced something" is not a check
            if len(gcols) == 0:
                results[name] = "ROWS-ONLY-NO-COLUMNS (empty schema)"
            elif len(grows) == 0:
                results[name] = "ROWS-ONLY-EMPTY (0 rows)"
            elif all(all(c == ("null",) for c in r) for r in grows):
                results[name] = "ROWS-ONLY-ALL-NULL (every cell null)"
            else:
                results[name] = f"rows-only rows={len(grows)} OK"
            continue
        _t_oracle = time.monotonic()
        try:
            ocols, otypes, orows = fetch_sorted_deadline(
                con, oracle[name], LAP_CEILING)
        except OracleTimeout:
            results[name] = (
                f"ORACLE-TOO-SLOW aborted at "
                f"{time.monotonic() - _t_oracle:.0f}s "
                f"(ceiling {LAP_CEILING:.0f}s) — trim this oracle")
            continue
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        if gcols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} oracle={ocols}"
            continue
        if gtypes != otypes:
            diff = [f"{c}: spark={g} oracle={o}"
                    for c, g, o in zip(gcols, gtypes, otypes) if g != o]
            results[name] = f"TYPE-MISMATCH {'; '.join(diff)}"
            continue
        if len(grows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(grows)} oracle={len(orows)}"
            continue
        exact = True
        bad = None
        for ri, (gr, orr) in enumerate(zip(grows, orows)):
            for ci, (gc, oc) in enumerate(zip(gr, orr)):
                eq, ex = cells_equal(gc, oc)
                if not eq:
                    bad = (ri, gcols[ci], gc, oc)
                    break
                exact = exact and ex
            if bad:
                break
        if bad:
            results[name] = f"VALUE-MISMATCH row={bad[0]} col={bad[1]} spark={bad[2]} oracle={bad[3]}"
        elif exact:
            results[name] = f"OK exact rows={len(grows)}"
        else:
            results[name] = f"OK tolerance-only rows={len(grows)} (float fuzz — tighten!)"

    if _lap[0] is not None:
        times[_lap[0]] = time.monotonic() - _lap[1]

    width = max(len(n) for n in results) if results else 0
    fails = 0
    rows_only = 0
    for n in sorted(results):
        r = results[n]
        if not r.startswith("OK") and not r.startswith("rows-only"):
            fails += 1
        if r.startswith("rows-only"):
            rows_only += 1
        # per-query oracle cost: when the driver gate runs against a
        # wall-clock budget, this is the profile that says WHICH oracle
        # to trim (only worth printing once it is material)
        t = times.get(n, 0.0)
        suffix = f"  [{t:.1f}s]" if t >= 2.0 else ""
        print(f"{n:<{width}}  {r}{suffix}")
    # rows_only is printed so an accidentally-dropped oracle entry is
    # visible as a count change even when nothing "fails"
    total_t = sum(times.values())
    print(f"\n{len(results)} checked, {len(results) - rows_only - fails} "
          f"oracle-backed OK, {rows_only} rows-only, {fails} failing "
          f"({total_t:.0f}s compare)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
