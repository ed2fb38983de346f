#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the sfDir parquet tables, read the Spark result parquet, sort
columns by name + rows, and compare row count, schema-ish, and values
(floats rounded for hashing like-for-like).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        exp, got = canon(exp), canon(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(exp.columns)}\n  spark:  {list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row count oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        mism = []
        for c in exp.columns:
            a, b = exp[c], got[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=1e-9, equal_nan=True):
                    mism.append(c)
            else:
                if not a.astype(str).equals(b.astype(str)):
                    mism.append(c)
        if mism:
            print(f"FAIL {name}: value mismatch in columns {mism}")
            for c in mism[:2]:
                diff = exp[c].astype(str) != got[c].astype(str)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"    row {i}: oracle={exp[c][i]!r} spark={got[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
