#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: for each query, loads the
Spark parquet result and runs the DuckDB oracle SQL on the same test
tables, sorts columns by name and rows by all columns, and compares
values exactly. Not part of the shipped engine.

DTYPE-STRICT (round 9): the driver's comparator hashes typed values,
so `7500 == 7500.0` is NOT a pass there. This gate therefore fails on
  - declared-type drift (DuckDB `sum(BIGINT)` returns HUGEINT; Spark
    writes BIGINT — identical values, different type, driver FAIL),
  - pandas-dtype drift after load (int32 vs int64, int64 vs float64),
  - int-vs-float equality at the value level, and
  - timestamps outside the datetime64[ns] range (the driver's load
    path overflows there even when both engines agree on the value).
Local green must predict driver green; lax is worse than broken.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    a_f, b_f = isinstance(a, float), isinstance(b, float)
    if a_f != b_f:
        return False  # int-vs-float: driver's typed hash differs
    if a_f and b_f:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def decl_types(rel):
    """column -> declared DuckDB type string for a relation."""
    return {c: str(t) for c, t in zip(rel.columns, rel.types)}


def ns_overflow(df):
    """(col, value) of the first datetime value outside datetime64[ns]
    range, else None. fetchdf may hand back datetime64[us]/object for
    wide-range timestamps — exactly the case that kills the driver.
    """
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime64") or (
                col.dtype == object and col.map(
                    lambda v: hasattr(v, "year"), na_action="ignore").any()):
            for v in col.dropna():
                try:
                    pd.Timestamp(v).as_unit("ns")
                except Exception:
                    return c, v
    return None


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
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            spark_types, duck_types = decl_types(spark_rel), decl_types(duck_rel)
            spark_df = spark_rel.fetchdf()
            duck_df = duck_rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/run error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        # declared-type strictness: HUGEINT/INTEGER/DECIMAL where the
        # Spark parquet says BIGINT/DOUBLE is a driver hash mismatch
        # even when every value compares equal
        type_drift = [(c, spark_types[c], duck_types[c]) for c in s.columns
                      if spark_types[c] != duck_types[c]]
        if type_drift:
            c, st, dt = type_drift[0]
            print(f"FAIL {name}: declared type drift on {c}: spark={st} oracle={dt}"
                  + (f" (+{len(type_drift) - 1} more)" if len(type_drift) > 1 else ""))
            n_fail += 1
            continue
        # pandas-dtype strictness: what the driver's hasher actually sees
        dtype_drift = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
                       if str(s[c].dtype) != str(o[c].dtype)]
        if dtype_drift:
            c, st, dt = dtype_drift[0]
            print(f"FAIL {name}: pandas dtype drift on {c}: spark={st} oracle={dt}"
                  + (f" (+{len(dtype_drift) - 1} more)" if len(dtype_drift) > 1 else ""))
            n_fail += 1
            continue
        over = ns_overflow(s) or ns_overflow(o)
        if over:
            c, v = over
            print(f"FAIL {name}: col {c} value {v!r} outside datetime64[ns] range")
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
