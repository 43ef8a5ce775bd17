#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate (dev tool only —
not part of the Scala library). Runs after `sbt "runMain graft.Verify
<sfDir> <outDir>"`: loads each query's parquet result, runs its oracle
SQL in DuckDB over the same parquet tables, and compares values
(columns sorted by name, rows as produced — both sides ORDER BY)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # Spark-written fixtures (GenScale/GenOffset) are directory-shaped
    p = f"{sf_dir}/{t}.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"NOROWS  {name} (no parquet written)"); fail += 1; continue
    got = pd.read_parquet(files[0])
    if name not in oracles:
        print(f"ROWSONLY {name}: rows={len(got)} " + ("OK" if len(got) > 0 else "EMPTY"))
        if len(got) == 0: fail += 1
        else: ok += 1
        continue
    try:
        exp = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    problems = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
    elif len(got) != len(exp):
        problems.append(f"rows {len(got)} vs {len(exp)}")
    else:
        gt = [str(got[c].dtype) for c in got.columns]
        et = [str(exp[c].dtype) for c in exp.columns]
        if gt != et:
            problems.append(f"dtypes {list(zip(got.columns, gt, et))}")
        try:
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), exp.reset_index(drop=True),
                check_dtype=False, check_exact=True)
        except AssertionError as e:
            problems.append(str(e).split("\n")[0] + " ...")
    if problems:
        print(f"FAIL    {name}: " + " | ".join(problems)); fail += 1
    else:
        print(f"OK      {name} ({len(got)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
