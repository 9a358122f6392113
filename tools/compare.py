#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each query's parquet dump from the Verify outDir, runs its oracle SQL
(oracle_sql.json) in DuckDB over the same scale-factor parquet tables, and
compares: row count, column names (sorted), and values (exact, NaN-safe).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(round(v, 9))
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        # The driver's value hash is arrow-type-sensitive across type
        # CLASSES (a DuckDB HUGEINT/decimal128 123 != a Spark BIGINT 123 —
        # broke q35/text_rolling_fp in r02) but tolerates integer-width
        # differences (int32 vs int64 passed in r02). Mirror that: compare
        # type classes, not exact widths.
        def tclass(t):
            s = str(t)
            for pfx, cls in [("int", "int"), ("uint", "int"),
                             ("float", "float"), ("double", "float"),
                             ("decimal", "decimal")]:
                if s.startswith(pfx):
                    return cls
            return s
        tbad = [(c, str(got.schema.field(c).type), str(exp.schema.field(c).type))
                for c in ecols
                if tclass(got.schema.field(c).type) != tclass(exp.schema.field(c).type)]
        if tbad:
            print(f"FAIL {name}: arrow type mismatch {tbad}")
            n_fail += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != oracle {exp.num_rows}")
            n_fail += 1
            continue
        erows = [tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()]
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        bad = next((i for i, (a, b) in enumerate(zip(erows, grows)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: row {bad}: spark={grows[bad]} oracle={erows[bad]}")
            n_fail += 1
        else:
            print(f"ok   {name} ({got.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
