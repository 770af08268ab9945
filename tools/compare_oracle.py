#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: for each query, loads the
Spark parquet result and runs the DuckDB oracle SQL on the same test
tables, sorts columns by name and rows by all columns, and compares
values exactly. Not part of the shipped engine.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # Verify's filter arg dumps a subset; compare only what exists
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/run error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        mismatch = None
        sv, ov = s.to_numpy(dtype=object), o.to_numpy(dtype=object)
        for i in range(len(sv)):
            for j in range(sv.shape[1]):
                if not values_equal(sv[i][j], ov[i][j]):
                    mismatch = (i, s.columns[j], sv[i][j], ov[i][j])
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed"
          + (f" ({n_skip} not dumped, skipped)" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
