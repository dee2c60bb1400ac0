#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Mirrors the driver's compare path, not a friendlier one (round 9 lesson:
a symmetric DuckDB-reads-both-sides compare hid a DECIMAL trailing-zero
canonicalization red and list-ified an array column the driver's pandas
sort crashes on):

 - the SPARK side is read with pyarrow -> pandas, preserving Decimal
   objects and list columns exactly as the driver sees them;
 - the ORACLE side is DuckDB -> pandas;
 - both sides sort columns by name, then sort ROWS by all columns with
   pandas sort_values (this is where an array/map/struct column raises,
   exactly like the driver), then compare stringified cells (this is
   where Decimal('...0') vs float canon diverges, exactly like the
   driver's hash).

Usage: python3 tools/check.py <sfDir> <outDir> [only_prefix] [--json=PATH]

--json=PATH additionally writes the driver-shaped per-query artifact
({name: {rows_match, schema_match, hash_match}}) — committed each round
as CORRECTNESS_local_r{N}.json so an empty driver-side artifact (r16
shipped `{}` and nothing noticed) is instantly visible and diagnosable
against the builder's own gate run (VERDICT-r16 task 3).
"""
import datetime
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq


def read_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise AssertionError("no spark output parquet")
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def canon_cell(x):
    # The driver hashes cell strings; NaN handled as a fixed token.
    # datetime.date (spark date32 via pyarrow) is normalized to the
    # midnight Timestamp duckdb's DATE becomes in pandas — the driver
    # treats those as equal (r9 evidence: rel_scd2_upsert green) while
    # it does NOT normalize Decimal (r9 evidence: rel_incremental_rollup
    # red on trailing-zero cents), so Decimal deliberately stays raw.
    if x is None or x is pd.NaT:
        return "<null>"
    if isinstance(x, float) and x != x:
        return "<nan>"
    if isinstance(x, datetime.date) and not isinstance(x, datetime.datetime):
        return str(pd.Timestamp(x))
    return str(x)


def main(sf_dir, out_dir, only=None, json_out=None):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracles.items()):
        if only and not name.startswith(only):
            continue
        rows_m = schema_m = hash_m = False
        err = None
        try:
            got = read_spark(out_dir, name)
            want = con.sql(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"columns differ: spark={list(got.columns)} duckdb={list(want.columns)}")
            schema_m = True
            if len(got) != len(want):
                raise AssertionError(f"rowcount differ: spark={len(got)} duckdb={len(want)}")
            rows_m = True
            cols = list(got.columns)
            # the driver's sort-then-hash: sort_values raises on
            # unsortable (list) columns -> that IS the failure mode we
            # must reproduce locally.
            got = got.sort_values(by=cols, ignore_index=True)
            want = want.sort_values(by=cols, ignore_index=True)
            for c in cols:
                a, b = list(got[c]), list(want[c])
                for i, (x, y) in enumerate(zip(a, b)):
                    xs, ys = canon_cell(x), canon_cell(y)
                    if xs != ys:
                        raise AssertionError(
                            f"col {c} row {i}: spark={xs!r} duckdb={ys!r}")
            hash_m = True
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: {err}")
            n_fail += 1
        entry = {"rows_match": rows_m, "schema_match": schema_m,
                 "hash_match": hash_m}
        if err:
            entry["error"] = err
        report[name] = entry
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"pass": n_pass, "fail": n_fail, "queries": report},
                      f, indent=0, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--json=")]
    jpath = next((a.split("=", 1)[1] for a in sys.argv[1:]
                  if a.startswith("--json=")), None)
    sys.exit(main(*argv[:3], json_out=jpath))
