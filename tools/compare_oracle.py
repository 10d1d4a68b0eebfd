#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the parquet tables in
<sfDir>, loads the Spark result parquet from <verifyOutDir>/<name>/, and
compares values (columns sorted by name, rows sorted by all columns).
NOT shipped code — dev-only parity check using driver-side tools.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # --only-present: compare only names Verify actually wrote (for
    # SPARK_GRAFT_ONLY-filtered iteration runs); a missing output is
    # then "skipped", not a failure. Full-gate runs keep the strict
    # behavior: every oracle must have a Spark result.
    only_present = "--only-present" in sys.argv
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            if only_present:
                continue
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {msg[0]} {msg[1] if len(msg) > 1 else ''}")
            # show first few diffs
            for c in got.columns:
                neq = got[c].astype(str) != want[c].astype(str)
                if neq.any():
                    i = neq.idxmax()
                    print(f"   col {c}: row {i} spark={got[c][i]!r} oracle={want[c][i]!r} ({neq.sum()} diffs)")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
