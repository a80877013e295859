#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables and compare against the parquet the
Verify main dumped. Exact value comparison after sorting columns by name.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(canon(v) for v in row)
                         for row in want.df()[want_cols].itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got_tbl = pq.read_table(f"{out_dir}/{name}")
            got_cols = sorted(got_tbl.column_names)
            got_df = got_tbl.to_pandas()[got_cols]
            got_rows = [tuple(canon(v) for v in row)
                        for row in got_df.itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: spark output error: {str(e)[:200]}")
            n_fail += 1
            continue
        if want_cols != got_cols:
            print(f"FAIL {name}: columns want={want_cols} got={got_cols}")
            n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: rows want={len(want_rows)} got={len(got_rows)}")
            n_fail += 1
            continue
        # order-insensitive compare (driver sorts before hashing; we sort too)
        if sorted(want_rows) != sorted(got_rows):
            bad = [(w, g) for w, g in zip(sorted(want_rows), sorted(got_rows))
                   if w != g][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
