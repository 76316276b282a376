#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
library itself has no Python dependency).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]

Loads each <verifyOutDir>/<key> parquet (Spark result), runs the oracle SQL
from <verifyOutDir>/oracle_sql.json in DuckDB 1.0.0 over views named after
the parquet tables in <sfDir>, and compares row-by-row with exact value
equality (after normalizing Decimal vs float and timestamp types).
"""
import sys, json, glob, math, datetime
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v)) if not isinstance(v, bool) else ("bool", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, list):
        return ("list", tuple(norm(x) for x in v))
    return (type(v).__name__, v)


def _connect():
    """duckdb.connect() with optional resource caps from the environment
    (parallel shard runs over big dev fixtures: 4 uncapped processes
    each default to 80% of host RAM and OOM together)."""
    con = duckdb.connect()
    import os
    if os.environ.get("DUCKDB_MEM"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    return con


def _register_views(con, sf_dir):
    """One view per testdata table. Driver sf dirs hold single files;
    ScaleUp fixtures hold Spark-written directories of part files."""
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")


def _fresh_connection(con, sf_dir):
    """Fresh per-key connection for the in-DuckDB compare modes: a
    long-lived connection's accumulated buffer-pool state was observed
    to flip one key's join plan into a 40 GB wedge in-sequence while the
    same key checked in seconds standalone. Pins the session timezone so
    TIMESTAMPTZ -> TIMESTAMP casts are host-independent."""
    con.close()
    con = _connect()
    _register_views(con, sf_dir)
    con.sql("SET TimeZone = 'UTC'")
    return con


def _norm_expr(edesc, gdesc):
    """SQL normalizer for the type classes the default path's norm()
    collapses (UTC-instant TIMESTAMPTZ vs naive TIMESTAMP, DECIMAL /
    HUGEINT vs DOUBLE) — shared by both in-DuckDB compare modes so they
    can never silently disagree on a type class. Returns
    nexpr(col [, side]) rendering a normalized column reference."""
    def nexpr(c, side=None):
        ref = f'{side}."{c}"' if side else f'"{c}"'
        t = (edesc[c] + " " + gdesc[c]).upper()
        if "TIMESTAMP" in t:
            return f"CAST({ref} AS TIMESTAMP)"
        if "DECIMAL" in t or "DOUBLE" in t or "FLOAT" in t or "HUGEINT" in t:
            return f"CAST({ref} AS DOUBLE)"
        return ref
    return nexpr


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--set-compare", "--ordered-compare")]
    # --set-compare: content-equality mode for big dev fixtures (sf1):
    # rowcount + EXCEPT ALL both directions INSIDE DuckDB, skipping the
    # 6M-row python tuple loop (~100x faster). Weaker than the default
    # positional compare (does not prove output ORDER) — the driver-SF
    # default mode remains the ordered row-by-row check.
    set_compare = "--set-compare" in sys.argv[1:]
    # --ordered-compare: POSITIONAL compare at set-compare scale — both
    # sides materialize as temp tables in their native order (the
    # oracle's CTAS preserves its ORDER BY as insertion order; the
    # parquet dump reads in sorted-filename order under DuckDB's default
    # preserve_insertion_order), then one rowid-equijoin counts
    # positions where any normalized column differs. Closes the
    # set-compare order-blindness gap on dumps too big for the python
    # row loop (r17 VERDICT task 5).
    ordered_compare = "--ordered-compare" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = _connect()
    _register_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    # Verify records keys that THREW in _errors.json (they have no parquet
    # dir, so without this they would look like an invocation mistake
    # rather than a broken operator) — report each as an explicit failure.
    # Only a missing file means "no keys threw"; a corrupt/half-written
    # _errors.json must fail loudly, not silently hide thrown keys.
    try:
        verify_errors = json.load(open(f"{out_dir}/_errors.json"))
    except FileNotFoundError:
        verify_errors = {}
    for key, msg in sorted(verify_errors.items()):
        if only and key not in only:
            continue
        print(f"FAIL {key}: threw in Verify: {msg[:200]}")
        failed.append(key)
    # explicit key args run in ARGV ORDER (a sharded sweep queues cheap
    # keys first); the no-args full sweep stays alphabetical
    key_seq = ([(k, oracle[k]) for k in args[2:] if k in oracle]
               if only else sorted(oracle.items()))
    for key, sql in key_seq:
        if only and key not in only:
            continue
        if key in verify_errors:
            continue  # already reported above
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"FAIL {key}: no spark output")
            failed.append(key)
            continue
        if ordered_compare:
            try:
                con = _fresh_connection(con, sf_dir)
                con.sql(f"CREATE OR REPLACE TEMP TABLE _exp AS {sql}")
                # sorted file list + preserve_insertion_order (default)
                # = the dump's global row order (Spark's final ORDER BY
                # stage writes range-partitioned sorted part files, so
                # part-file name order IS global order)
                con.sql(f"CREATE OR REPLACE TEMP TABLE _got AS "
                        f"SELECT * FROM read_parquet({files!r})")
                edesc = {r[0]: r[1] for r in con.sql("DESCRIBE _exp").fetchall()}
                gdesc = {r[0]: r[1] for r in con.sql("DESCRIBE _got").fetchall()}
                ec, gc = sorted(edesc), sorted(gdesc)
                if ec != gc:
                    print(f"FAIL {key}: columns spark={gc} oracle={ec}")
                    failed.append(key)
                    continue
                nexpr = _norm_expr(edesc, gdesc)
                ne = con.sql("SELECT count(*) FROM _exp").fetchone()[0]
                ng = con.sql("SELECT count(*) FROM _got").fetchone()[0]
                if ne != ng:
                    print(f"FAIL {key}: rowcount spark={ng} oracle={ne}")
                    failed.append(key)
                    continue
                diff = " OR ".join(
                    f'({nexpr(c, "e")} IS DISTINCT FROM {nexpr(c, "g")})'
                    for c in ec)
                bad = con.sql(
                    "SELECT count(*) FROM _exp e JOIN _got g "
                    f"ON e.rowid = g.rowid WHERE {diff}").fetchone()[0]
                if bad:
                    first = con.sql(
                        "SELECT e.rowid FROM _exp e JOIN _got g "
                        f"ON e.rowid = g.rowid WHERE {diff} "
                        "ORDER BY e.rowid LIMIT 1").fetchone()[0]
                    print(f"FAIL {key}: {bad}/{ng} positions differ "
                          f"(first at row {first})")
                    failed.append(key)
                else:
                    print(f"ok   {key}: {ng} rows (ordered compare)")
            except Exception as e:
                print(f"FAIL {key}: oracle error: {e}")
                failed.append(key)
            continue
        if set_compare:
            try:
                con = _fresh_connection(con, sf_dir)
                # TEMP TABLE, not VIEW: with the oracle inlined into the
                # EXCEPT ALL pipeline, DuckDB budgets each operator a
                # fraction of memory_limit and a heavy oracle (ordered
                # list agg at 27M rows) OOMs inside the set op while the
                # same query succeeds standalone — materialize once,
                # then both EXCEPT directions stream over the table
                con.sql(f"CREATE OR REPLACE TEMP TABLE _exp AS {sql}")
                con.sql(f"CREATE OR REPLACE TEMP VIEW _got AS "
                        f"SELECT * FROM read_parquet({files!r})")
                edesc = {r[0]: r[1] for r in con.sql("DESCRIBE _exp").fetchall()}
                gdesc = {r[0]: r[1] for r in con.sql("DESCRIBE _got").fetchall()}
                ec, gc = sorted(edesc), sorted(gdesc)
                if ec != gc:
                    print(f"FAIL {key}: columns spark={gc} oracle={ec}")
                    failed.append(key)
                    continue
                nexpr = _norm_expr(edesc, gdesc)
                cols = ", ".join(f'{nexpr(c)} AS "{c}"' for c in ec)
                ne, ng, d1, d2 = (
                    con.sql("SELECT count(*) FROM _exp").fetchone()[0],
                    con.sql("SELECT count(*) FROM _got").fetchone()[0],
                    con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _got "
                            f"EXCEPT ALL SELECT {cols} FROM _exp)").fetchone()[0],
                    con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _exp "
                            f"EXCEPT ALL SELECT {cols} FROM _got)").fetchone()[0])
                if ne != ng or d1 or d2:
                    print(f"FAIL {key}: rows spark={ng} oracle={ne} "
                          f"spark-only={d1} oracle-only={d2}")
                    failed.append(key)
                else:
                    print(f"ok   {key}: {ng} rows (set compare)")
            except Exception as e:
                print(f"FAIL {key}: oracle error: {e}")
                failed.append(key)
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(r[exp.columns.index(c)] for c in exp_cols)
                        for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            failed.append(key)
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = sorted(got.columns)
        got_rows = [tuple(r[got.columns.index(c)] for c in got_cols)
                    for r in got.fetchall()]
        if got_cols != exp_cols:
            print(f"FAIL {key}: columns spark={got_cols} oracle={exp_cols}")
            failed.append(key)
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {key}: rowcount spark={len(got_rows)} oracle={len(exp_rows)}")
            failed.append(key)
            continue
        bad = 0
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            ng, ne = tuple(map(norm, g)), tuple(map(norm, e))
            if ng != ne:
                if bad == 0:
                    print(f"FAIL {key}: row {i} spark={g} oracle={e}")
                bad += 1
        if bad:
            print(f"FAIL {key}: {bad}/{len(got_rows)} rows differ")
            failed.append(key)
        else:
            print(f"ok   {key}: {len(got_rows)} rows, cols={got_cols}")
    print(f"\n{len(oracle) if not only else len(only)} checked, {len(failed)} failed"
          + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
