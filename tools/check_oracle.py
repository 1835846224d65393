#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against DuckDB views over the sfDir parquet tables, and compares
with the Spark result parquet under <verifyOutDir>/<name>/.

Comparison mimics the driver: columns sorted by name, rows sorted by all
columns, float comparison with small tolerance. Exit 0 iff all match.

Dev-only tool — not part of the library (duckdb/pandas are driver-side).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # unify column-wise types for sorting stability
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # list/array cells are unhashable and unsortable — stringify
            # (queries should emit joined strings anyway, like
            # q_group_collect; this keeps the tool from crashing when
            # one doesn't)
            import numpy as np

            def _scalar_str(v):
                # normalize missing values to ONE sentinel before
                # stringifying: Spark/DuckDB parquet may materialize a
                # missing cell as None, NaN, or NaT, and str() would
                # render those as distinct ('None' vs 'nan') — a
                # spurious mismatch — or let a real None-vs-'None' type
                # drift hash equal. One sentinel that no query emits.
                if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
                    return "<NULL>"
                return str(v)

            def _cell_str(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    return ",".join(_scalar_str(x) for x in v)
                return _scalar_str(v)

            if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
                print(f"  [warn] column {c!r}: array-stringify fallback "
                      "engaged (queries should emit joined strings)")
                df[c] = df[c].map(_cell_str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"schema mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np
            ok = np.allclose(av.astype(float), bv.astype(float),
                             rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            diff_idx = None
            try:
                mism = (av.astype(str) != bv.astype(str))
                diff_idx = mism.idxmax()
                problems.append(
                    f"column '{c}' differs; first diff row {diff_idx}: "
                    f"spark={av[diff_idx]!r} duck={bv[diff_idx]!r}")
            except Exception:
                problems.append(f"column '{c}' differs")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        parts = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        if not parts:
            print(f"FAIL {name}: no spark result parquet in {res_dir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in parts],
                                 ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name} ({len(spark_df)} rows): " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    # queries with no oracle → rows-only (driver behavior)
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} oracle queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
