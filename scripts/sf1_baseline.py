#!/usr/bin/env python3
"""DuckDB side of the SCALE.md sf0.1-vs-sf1 crossover bench.

Unlike duckdb_baseline.py this handles directory-shaped parquet tables
(GenScale writes Spark-native `<name>.parquet/` directories), restricts
to a query subset, times each query min-of-N, and can cross-check the
oracle result against a Spark verify dump.

Usage:
  python3 scripts/sf1_baseline.py <oracle_sql.json> <sfDir> \
      [--queries q30,q33] [--runs 2] [--check <verifyOutDir>] \
      [--timeout-hint SECONDS]
"""
import duckdb, glob, json, math, os, sys, threading, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def view_source(sf_dir: str, t: str) -> str:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.isdir(p):
        return f"read_parquet('{p}/*.parquet')"
    return f"read_parquet('{p}')"


def norm(rows):
    import decimal
    out = []
    for r in rows:
        rr = []
        for v in r:
            # DuckDB ROUND() yields DECIMAL (python Decimal) where the
            # Spark dump holds DOUBLE — unify before comparing
            if isinstance(v, (float, decimal.Decimal)):
                rr.append(round(float(v), 6) + 0.0)  # -0.0 -> 0.0
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> None:
    oracle_json, sf_dir = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    subset, runs, check_dir, cap = None, 2, None, 600.0
    i = 0
    while i < len(args):
        if args[i] == "--queries":
            subset = args[i + 1].split(","); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--check":
            check_dir = args[i + 1]; i += 2
        elif args[i] == "--cap":
            cap = float(args[i + 1]); i += 2
        else:
            i += 1
    sqls = json.load(open(oracle_json))
    if subset:
        sqls = {k: v for k, v in sqls.items()
                if any(s in k for s in subset)}
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {view_source(sf_dir, t)}")
        except duckdb.IOException:
            # fact-only scale dirs (GenScaleFacts) carry just the tables
            # the measured queries read; absent views only matter if a
            # selected query references them, which then fails loudly
            pass
    report = {}
    for name, sql in sorted(sqls.items()):
        samples = []
        rows = None
        timed_out = False
        for _ in range(runs):
            # watchdog: interrupt the query past the cap so one
            # superlinear oracle can't eat the whole session — the
            # ">cap" bound is itself the crossover data point
            done = threading.Event()

            def watchdog():
                if not done.wait(cap):
                    con.interrupt()

            w = threading.Thread(target=watchdog, daemon=True)
            w.start()
            t0 = time.time()
            try:
                rows = con.execute(sql).fetchall()
                samples.append(round(time.time() - t0, 3))
            except duckdb.InterruptException:
                timed_out = True
            finally:
                done.set()
            print(f"[sf1] {name}: {round(time.time()-t0,1)}s"
                  + (" (interrupted)" if timed_out else ""),
                  file=sys.stderr, flush=True)
            if timed_out:
                break
        if timed_out and not samples:
            report[name] = {"sec": None, "timeout_cap": cap,
                            "note": f"interrupted at {cap}s"}
            continue
        entry = {"sec": min(samples), "samples": samples, "rows": len(rows)}
        if check_dir:
            spark_dir = os.path.join(check_dir, name)
            files = sorted(glob.glob(os.path.join(spark_dir, "*.parquet")))
            if not files:
                entry["check"] = "missing-spark-dump"
            else:
                srows = con.execute(
                    f"SELECT * FROM read_parquet({files!r})").fetchall()
                a, b = norm(rows), norm(srows)
                if len(a) != len(b):
                    entry["check"] = f"ROWS {len(a)} vs {len(b)}"
                else:
                    bad = sum(1 for x, y in zip(a, b) if x != y)
                    entry["check"] = "ok" if bad == 0 else f"MISMATCH {bad} rows"
        report[name] = entry
    total = round(sum(e["sec"] for e in report.values()
                      if e.get("sec") is not None), 2)
    print(json.dumps({"metric": "duckdb_subset_total", "value": total,
                      "unit": "sec", "sf": sf_dir, "queries": report}))


if __name__ == "__main__":
    main()
