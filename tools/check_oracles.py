#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate:
run graft.Verify's parquet dumps against oracle_sql.json in DuckDB and
compare exactly (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # canonical dtypes for compare
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # Verify-side construction failures (dump totality): every key the
    # Scala registry holds but could not dump lands here — surface each.
    import os.path
    if os.path.exists(f"{out_dir}/verify_errors.json"):
        for name, err in sorted(json.load(open(f"{out_dir}/verify_errors.json")).items()):
            print(f"FAIL {name}: verify-side construction error: {err[:300]}")
            failures += 1
    else:
        print("WARN verify_errors.json missing (old Verify build?) — totality not assertable")
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                failures += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                failures += 1
                continue
            try:
                pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)
                print(f"OK   {name}: {len(g)} rows")
            except AssertionError as e:
                print(f"FAIL {name}: values differ: {str(e).splitlines()[-1][:200]}")
                # show first differing cells
                for c in g.columns:
                    neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                    if neq.any():
                        i = neq.idxmax()
                        print(f"   col {c} row {i}: spark={g[c][i]!r} duck={w[c][i]!r}")
                failures += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
    # rows-only queries (no oracle): check parquet exists and >0 rows
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:200]}")
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
