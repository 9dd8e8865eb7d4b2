#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, registers the sf_dir parquet tables
as DuckDB views, runs each oracle query, and compares against the Spark
parquet output in <verify_out_dir>/<name>/ — columns sorted by name, rows
sorted by all columns, exact value equality (floats bit-compared after
normalizing -0.0/NaN).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL  {name}: spark output missing: {e}")
            n_bad += 1
            continue

        def canon(rows):
            return sorted(
                [tuple(norm(r[k]) for k in sorted(r)) for r in rows],
                key=lambda t: tuple(str(x) for x in t))

        exp_cols = sorted(exp[0]) if exp else []
        got_cols = sorted(got[0]) if got else []
        if exp_cols != got_cols:
            print(f"FAIL  {name}: columns differ: {got_cols} vs {exp_cols}")
            n_bad += 1
            continue
        ce, cg = canon(exp), canon(got)
        if ce == cg:
            print(f"MATCH {name} ({len(got)} rows)")
            n_ok += 1
        else:
            print(f"FAIL  {name}: values differ "
                  f"({len(got)} spark rows vs {len(exp)} oracle rows)")
            for i, (a, b) in enumerate(zip(cg, ce)):
                if a != b:
                    print(f"   row {i}: spark={a}")
                    print(f"   row {i}: oracle={b}")
                    break
            n_bad += 1
    print(f"\n{n_ok} match, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
