#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Mimics the driver: for each SparkEntry query output parquet written by
graft.Verify, replays the oracle SQL from oracle_sql.json in DuckDB over
the same sf tables, then compares (columns sorted by name, values
compared cell-by-cell; doubles must match exactly — bit-identity is the
design goal, see Tables.scala).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb


def canon(v):
    if isinstance(v, float):
        return ("f", v)  # exact compare; bit-identity is the contract
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"columns differ: spark={list(got.columns)} duckdb={list(want.columns)}")
            if len(got) != len(want):
                raise AssertionError(f"rowcount differ: spark={len(got)} duckdb={len(want)}")
            for c in got.columns:
                a, b = list(got[c]), list(want[c])
                for i, (x, y) in enumerate(zip(a, b)):
                    xs, ys = x, y
                    if isinstance(x, (list, tuple)) or str(type(x)).find("ndarray") >= 0:
                        xs, ys = list(x), list(y)
                    if isinstance(xs, float) and isinstance(ys, float):
                        if math.isnan(xs) and math.isnan(ys):
                            continue
                        if xs != ys:
                            raise AssertionError(
                                f"col {c} row {i}: spark={xs!r} duckdb={ys!r} (Δ={xs - ys})")
                    elif str(xs) != str(ys):
                        raise AssertionError(f"col {c} row {i}: spark={xs!r} duckdb={ys!r}")
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
