#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-verify).
2. For each query result parquet, runs the corresponding oracle SQL from
   oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet) and
   compares: column set (sorted by name), row count, and exact values.

This is builder-side tooling only; the library itself never touches it.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def compare(name, spark_df, oracle_df):
    issues = []
    scols = sorted(spark_df.columns)
    ocols = sorted(oracle_df.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(spark_df) != len(oracle_df):
        issues.append(f"rowcount differs: spark={len(spark_df)} oracle={len(oracle_df)}")
        return issues
    s = spark_df[scols].reset_index(drop=True)
    o = oracle_df[ocols].reset_index(drop=True)
    for c in scols:
        sv = s[c].map(norm_cell)
        ov = o[c].map(norm_cell)
        neq = (sv != ov)
        if neq.any():
            i = neq.idxmax()
            n = int(neq.sum())
            issues.append(
                f"col {c}: {n}/{len(sv)} cells differ; first at row {i}: "
                f"spark={sv[i]} oracle={ov[i]} "
                f"(types {type(s[c][i]).__name__}/{type(o[c][i]).__name__})")
    return issues


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = args[2].split(",") if len(args) > 2 else None

    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write("\n".join(r.stdout.splitlines()[-5:]) + "\n")
        if r.returncode != 0:
            print("VERIFY FAILED")
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            sys.exit(1)

    oracle_sql = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        pdir = Path(f"{out_dir}/{name}")
        if not pdir.exists():
            print(f"[FAIL] {name}: no spark output written")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_df, oracle_df)
        if issues:
            n_fail += 1
            print(f"[FAIL] {name}")
            for i in issues[:6]:
                print(f"       {i}")
        else:
            n_pass += 1
            print(f"[ok]   {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
