#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [--no-strict-types]

Reads <verify_out_dir>/oracle_sql.json, registers the sf_dir parquet tables
as DuckDB views, runs each oracle query, and compares against the Spark
parquet output in <verify_out_dir>/<name>/ — columns sorted by name, rows
sorted by all columns, exact value equality (floats bit-compared after
normalizing -0.0/NaN).

Strict-types (ON by default): the driver's hash is TYPE-sensitive, but the
value compare below normalizes through Python objects and so cannot see a
DuckDB HUGEINT (int128, e.g. an uncast windowed sum(BIGINT)) or DECIMAL
where Spark emits BIGINT/DOUBLE — round 8's q260 passed this script while
failing the driver on exactly that. The lint compares the Arrow type
signature of the oracle result against the Spark parquet schema per column
and reports TYPEFAIL on any divergence outside a small physical-encoding
allowlist (string widths, timestamp tz representation) that the driver's
normalization also ignores.
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


def canon_type(t):
    """Canonical logical type name for an Arrow DataType.

    Collapses the differences the driver's hash also ignores (calibrated
    against CORRECTNESS_r08: six driver-GREEN queries carry int32 Spark
    vs int64 oracle, so machine-int widths are normalized there):
    utf8/large_utf8, binary widths, list flavors, timestamp unit/tz
    metadata, and int8..int64 signed/unsigned widths. NOT collapsed:
    HUGEINT→decimal128(38,0) vs int64 (exactly q260's driver failure)
    and decimal precision/scale vs float — the classes the driver's
    type-sensitive hash does diverge on.
    """
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"{t.field(i).name}: {canon_type(t.field(i).type)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)}, {canon_type(t.item_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def type_sig(arrow_table):
    return {f.name: canon_type(f.type) for f in arrow_table.schema}


def main(out_dir, sf_dir, strict_types=True):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        zero_allow = json.load(open(f"{out_dir}/zero_row_allowlist.json"))
    except FileNotFoundError:
        zero_allow = {}
    n_ok = n_bad = n_type = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp_tbl = con.execute(sql).fetch_arrow_table()
            exp = exp_tbl.to_pylist()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got_tbl = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table()
            got = got_tbl.to_pylist()
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

        # The driver's pandas row-sort crashes on a bytearray cell
        # ('unhashable type', r13's q369), so a gate query must never
        # emit a raw binary column — project hex()/md5() on BOTH
        # sides instead. Flagged as a hard FAIL here so it never
        # reaches the driver.
        bin_cols = [f.name for f in got_tbl.schema
                    if "binary" in canon_type(f.type)]
        if bin_cols:
            print(f"FAIL  {name}: binary column(s) {bin_cols} in gate "
                  "output — the driver harness cannot row-sort bytes; "
                  "project hex()/md5() on both sides")
            n_bad += 1
            continue

        type_bad = []
        if strict_types:
            es, gs = type_sig(exp_tbl), type_sig(got_tbl)
            for c in sorted(set(es) | set(gs)):
                if es.get(c) != gs.get(c):
                    type_bad.append(
                        f"{c}: spark={gs.get(c)} oracle={es.get(c)}")

        ce, cg = canon(exp), canon(got)
        if ce == cg and not type_bad and not got and name not in zero_allow:
            # empty-vs-empty certifies nothing (the q326 class): a gate
            # row with 0 Spark rows is a FAIL unless allowlisted with a
            # reason in SparkEntry.zeroRowAllowlist
            print(f"FAIL  {name}: VACUOUS 0-row gate (values match but "
                  "certify nothing; not on zero_row_allowlist)")
            n_bad += 1
        elif ce == cg and not type_bad:
            tag = " [0 rows, allowlisted]" if not got else ""
            print(f"MATCH {name} ({len(got)} rows){tag}")
            n_ok += 1
        elif ce == cg:
            print(f"TYPEFAIL {name}: values match but column types differ "
                  f"(driver hash WILL diverge): {'; '.join(type_bad)}")
            n_type += 1
        else:
            print(f"FAIL  {name}: values differ "
                  f"({len(got)} spark rows vs {len(exp)} oracle rows)")
            for i, (a, b) in enumerate(zip(cg, ce)):
                if a != b:
                    print(f"   row {i}: spark={a}")
                    print(f"   row {i}: oracle={b}")
                    break
            n_bad += 1
    print(f"\n{n_ok} match, {n_bad} fail, {n_type} typefail")
    return 1 if (n_bad or n_type) else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--no-strict-types" not in sys.argv
    sys.exit(main(args[0], args[1], strict))
