#!/usr/bin/env python3
"""Regenerate the numeric DuckDB baseline for BASELINE.json.

Runs every SparkEntry.oracleSql query (dumped by graft.Verify as
oracle_sql.json) against the parquet tables of a scale-factor dir and
prints per-query + total wall time.

Usage: python3 scripts/duckdb_baseline.py <oracle_sql.json> <sfDir>
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(oracle_json: str, sf_dir: str) -> None:
    sqls = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    total, times = 0.0, {}
    for name, sql in sorted(sqls.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "sf": sf_dir, "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
