#!/usr/bin/env python3
"""DuckDB-side per-query benchmark: runs every oracle SQL from a Verify dump
against the same sf tables Spark benches on, so `bench_vs_baseline` is
driver-auditable instead of builder-asserted.

Each query runs N times (default 3, median reported), materialized via
fetchall() — the closest analogue to Spark's noop-sink full execution.

Usage: python3 tools/duckbench.py <sfDir> <oracleSqlJson> [runs]
Emits one JSON line on stdout and writes it to DUCKBENCH.json.
"""
import sys, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    queries, errors = {}, {}
    for name in sorted(oracle):
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            try:
                con.execute(oracle[name]).fetchall()
                times.append(time.perf_counter() - t0)
            except Exception as e:
                errors[name] = str(e)[:200]
                break
        if times:
            queries[name] = statistics.median(times)
    line = json.dumps({"metric": "duck_total", "value": sum(queries.values()),
                       "unit": "sec", "queries": queries, "errors": errors,
                       "runs": runs, "sf": sf_dir})
    print(line)
    with open("DUCKBENCH.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
