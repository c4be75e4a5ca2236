#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Runs graft.Verify output against DuckDB oracles: for each query dir in
OUT, load spark parquet + run oracle_sql.json[name] on the testdata
views, sort columns by name / rows by all values, compare cell-wise.

Usage: check_oracle.py SF_DIR OUT_DIR [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mimic the driver's exact hash
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetch_df()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_df()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                raise AssertionError(
                    f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            er = sorted([tuple(norm(v) for v in r) for r in exp.itertuples(index=False)])
            gr = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)])
            if len(er) != len(gr):
                raise AssertionError(f"row count: oracle={len(er)} spark={len(gr)}")
            for i, (a, b) in enumerate(zip(er, gr)):
                if a != b:
                    raise AssertionError(f"row {i}: oracle={a} spark={b}")
            print(f"PASS {name} ({len(er)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
