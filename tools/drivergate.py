#!/usr/bin/env python3
"""Emulate the driver's pandas-level correctness gate, which selfcheck.py's
value-level compare cannot catch: the driver loads both sides as pandas
frames (DuckDB via .df(), Spark via read_parquet), sorts columns by name,
and hashes values — so a dtype difference (float64 vs int64/object(Decimal))
fails the hash even when values are equal.

This tool compares, per query: column sets, pandas dtypes after name-sort,
and bit-exact values (floats compared by bit pattern, not tolerance).

Usage: python3 tools/drivergate.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, glob, json
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_kind(dt):
    """Driver-relevant dtype classes: int widths hash alike (verified: q44
    passes with int32-vs-int64), but float64 vs int vs object do not."""
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return str(dt)


def is_missing(x):
    try:
        return x is None or bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def cell_eq(a, b):
    if is_missing(a) or is_missing(b):
        return is_missing(a) == is_missing(b)
    if isinstance(a, float) and isinstance(b, float):
        return a == b and np.signbit(a) == np.signbit(b)  # bit-exact
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return list(a) == list(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    from foldprobe import check_fold_order
    check_fold_order(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: cols {gc} != {wc}")
            n_fail += 1
            continue
        got, want = got[gc], want[wc]
        bad_dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gc
                  if norm_kind(got[c].dtype) != norm_kind(want[c].dtype)]
        if bad_dt:
            print(f"FAIL {name}: dtypes {bad_dt}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in gc:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cell_eq(a, b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: value col={c} row={i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, dtypes+values bit-exact)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
