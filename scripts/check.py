#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: schema (sorted column names),
row count, and exact multiset of stringified rows (columns sorted by name).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style: floats compared via repr of rounded value
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def rows_key(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(canon(v) for v in row) for row in zip(*data)) if data else []
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        spark_t = pq.read_table(res_dir)
        try:
            duck_t = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = rows_key(spark_t)
        dc, dr = rows_key(duck_t)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            _diff(sr, dr)
            n_fail += 1
            continue
        if sr != dr:
            print(f"FAIL {name}: value mismatch ({len(sr)} rows)")
            _diff(sr, dr)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

def _diff(sr, dr):
    ss, ds = set(sr), set(dr)
    for r in list(ss - ds)[:5]:
        print(f"   spark-only: {r}")
    for r in list(ds - ss)[:5]:
        print(f"   duck-only:  {r}")

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
