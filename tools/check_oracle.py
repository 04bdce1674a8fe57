#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables and compare with the Spark results
dumped by graft.Verify (row count, sorted-by-column-name value hash).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # str() of the pandas cell value: matches the driver's observed
    # behavior (int32 vs int64 compare equal, float64 3.0 vs int64 3 do
    # NOT — DuckDB HUGEINT sums become float64 via .df() and fail).
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), [cols[i] for i in order], hash(tuple(lines)), lines


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_pd = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df()
            oracle_pd = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sn, sc, sh, slines = frame_key(
            list(spark_pd.columns),
            list(spark_pd.itertuples(index=False, name=None)))
        on, oc, oh, olines = frame_key(
            list(oracle_pd.columns),
            list(oracle_pd.itertuples(index=False, name=None)))
        if sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL {name}: rows {sn} != {on}")
            n_fail += 1
        elif sh != oh:
            diff = [(a, b) for a, b in zip(slines, olines) if a != b][:3]
            print(f"FAIL {name}: value hash mismatch; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled queries ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
