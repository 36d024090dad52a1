#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run;
  2. registers every parquet table in DuckDB under its bare name;
  3. runs each oracle_sql.json entry and compares against the Spark
     parquet output: columns sorted by name, rows sorted by all columns,
     exact value comparison (plus a fuzzy pass to localize float drift).
"""
import json, sys, glob, os
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name} (no spark output)")
            n_bad += 1
            continue
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)],
                             ignore_index=True))
        status = None
        if list(got.columns) != list(want.columns):
            status = f"COLS     got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS     got={len(got)} want={len(want)}"
        else:
            got2 = got.reset_index(drop=True)
            want2 = want.reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(got2, want2, check_dtype=False,
                                              check_exact=True)
            except AssertionError:
                try:
                    pd.testing.assert_frame_equal(got2, want2,
                                                  check_dtype=False, rtol=1e-9)
                    status = "FLOAT~   exact mismatch, fuzzy ok"
                except AssertionError as e2:
                    status = "VALUES   " + str(e2).split("\n")[0]
        # dtype check (schema match hint)
        dt_note = ""
        if status is None:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    dt_note = f"  [dtype {c}: {got[c].dtype} vs {want[c].dtype}]"
        if status is None:
            print(f"OK       {name} ({len(got)} rows){dt_note}")
            n_ok += 1
        else:
            print(f"FAIL     {name}: {status}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
