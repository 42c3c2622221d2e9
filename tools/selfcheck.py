#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, read the Spark-written parquet from Verify, and
compare values exactly (column-name-sorted, row-sorted and row-order both).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    from foldprobe import check_fold_order
    check_fold_order(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    import json
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        # reorder columns by sorted name (mimic driver)
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = [tuple(canon(r[i]) for i in gi) for r in got]
        w = [tuple(canon(r[i]) for i in wi) for r in want]
        if g == w:
            print(f"PASS {name} ({len(g)} rows, ordered)")
            n_pass += 1
        elif sorted(map(repr, g)) == sorted(map(repr, w)):
            print(f"PASS {name} ({len(g)} rows, set-equal only — CHECK ORDERING)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            sg, sw = sorted(map(repr, g)), sorted(map(repr, w))
            diffs = [i for i, (a, b) in enumerate(zip(sg, sw)) if a != b][:3]
            for i in diffs:
                print(f"  spark[{i}]: {sg[i][:200]}")
                print(f"  duck [{i}]: {sw[i][:200]}")
            if len(sg) != len(sw):
                only_g = set(sg) - set(sw)
                only_w = set(sw) - set(sg)
                for x in list(only_g)[:2]:
                    print(f"  only-spark: {x[:200]}")
                for x in list(only_w)[:2]:
                    print(f"  only-duck:  {x[:200]}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
