#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate:
run graft.Verify's parquet dumps against oracle_sql.json in DuckDB and
compare exactly (columns sorted by name, rows sorted by all columns).

Sharded across worker processes (each with its own DuckDB connection) —
the oracle mirrors of the heavy keys (incremental-delta replay, PQ fit,
power-iteration chains) dominate sequential wall-time; 12 workers take
the full 240-key suite from hours to ~15 min.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [--workers N] [keys...]
"""
import glob
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_SF_DIR = None
_OUT_DIR = None
_CON = None


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


def _init(sf_dir: str, out_dir: str) -> None:
    global _SF_DIR, _OUT_DIR, _CON
    _SF_DIR, _OUT_DIR = sf_dir, out_dir
    _CON = duckdb.connect()
    for t in TABLES:
        _CON.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")


def check_one(item):
    """Returns (name, status_line, ok) — runs in a worker process."""
    name, sql = item
    t0 = time.time()
    try:
        got = _CON.execute(
            f"SELECT * FROM read_parquet('{_OUT_DIR}/{name}/*.parquet')").df()
        want = _CON.execute(sql).df()
        g, w = normalize(got), normalize(want)
        el = f"[{time.time() - t0:5.1f}s]"
        if list(g.columns) != list(w.columns):
            return name, f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}", False
        if len(g) != len(w):
            return name, f"FAIL {name}: rows {len(g)} != {len(w)}", False
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)
            return name, f"OK   {name}: {len(g)} rows {el}", True
        except AssertionError as e:
            lines = [f"FAIL {name}: values differ: {str(e).splitlines()[-1][:200]}"]
            for c in g.columns:
                neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    lines.append(f"   col {c} row {i}: spark={g[c][i]!r} duck={w[c][i]!r}")
            return name, "\n".join(lines), False
    except Exception as e:
        return name, f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}", False


# DuckDB output types the driver's strict value-hash handles identically
# to Spark's. Anything OUTSIDE this set (HUGEINT from SUM(BIGINT)
# promotion, DECIMAL from integer division chains, UBIGINT) hashes
# differently even when values are numerically identical — the exact
# class of bug that made q_orders_seasonality FAIL the r9 gate.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "BLOB"}


def check_types(sf_dir: str, out_dir: str, only: list) -> int:
    """--types mode: DESCRIBE every oracle query and assert each output
    column's DuckDB type is in ALLOWED_TYPES. Catches latent HUGEINT /
    DECIMAL promotions without needing the Spark-side parquet dumps.
    Oracles referencing Verify-written temp paths that don't exist yet
    are reported SKIP (they type-check in the full gate run instead)."""
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = skips = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").df()
        except Exception as e:
            msg = str(e)
            if "No files found" in msg or "no files found" in msg or "IO Error" in msg:
                print(f"SKIP {name}: references files not present ({msg[:120]})")
                skips += 1
                continue
            print(f"ERROR {name}: {type(e).__name__}: {msg[:200]}")
            failures += 1
            continue
        bad = [(r["column_name"], r["column_type"]) for _, r in desc.iterrows()
               if r["column_type"].split("(")[0].upper() not in ALLOWED_TYPES
               and not r["column_type"].upper().startswith("TIMESTAMP")]
        if bad:
            print(f"FAIL {name}: non-hashsafe oracle column types: {bad}")
            failures += 1
        else:
            print(f"OK   {name}")
    print(f"\n{'TYPES GREEN' if failures == 0 else f'{failures} TYPE FAILURES'} "
          f"({len(oracles)} oracle keys, {skips} skipped)")
    return 1 if failures else 0


def main(sf_dir: str, out_dir: str, workers: int, only: list) -> int:
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = [k for k in only if k not in oracles]
        if missing:
            print(f"WARN keys not in oracle_sql.json: {missing}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    # Verify-side construction failures (dump totality): every key the
    # Scala registry holds but could not dump lands here — surface each.
    if os.path.exists(f"{out_dir}/verify_errors.json"):
        for name, err in sorted(json.load(open(f"{out_dir}/verify_errors.json")).items()):
            print(f"FAIL {name}: verify-side construction error: {err[:300]}")
            failures += 1
    else:
        print("WARN verify_errors.json missing (old Verify build?) — totality not assertable")
    # verify_manifest.json (SURVEY §6): per-key ran/secs/oracle/err.
    # Cross-check totality: every oracle key must appear as ran=true.
    if os.path.exists(f"{out_dir}/verify_manifest.json"):
        manifest = json.load(open(f"{out_dir}/verify_manifest.json"))
        for name in sorted(set(oracles) - {k for k, m in manifest.items() if m["ran"]}):
            print(f"FAIL {name}: oracle key not marked ran=true in verify_manifest.json")
            failures += 1
    items = sorted(oracles.items())
    t0 = time.time()
    if workers <= 1:
        _init(sf_dir, out_dir)
        results = map(check_one, items)
        for _, line, ok in results:
            print(line, flush=True)
            failures += 0 if ok else 1
    else:
        with ProcessPoolExecutor(max_workers=workers, initializer=_init,
                                 initargs=(sf_dir, out_dir)) as ex:
            for _, line, ok in ex.map(check_one, items):
                print(line, flush=True)
                failures += 0 if ok else 1
    # rows-only queries (no oracle): check parquet exists and >0 rows
    con = duckdb.connect()
    full = json.load(open(f"{out_dir}/oracle_sql.json"))
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in full or (only and name not in only):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:200]}")
            failures += 1
    el = time.time() - t0
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(items)} oracle keys, {workers} workers, {el:.0f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    workers = max(1, (os.cpu_count() or 4) // 3)
    types_mode = False
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--workers":
            workers = int(argv[i + 1])
            i += 2
        elif argv[i] == "--types":
            types_mode = True
            i += 1
        else:
            rest.append(argv[i])
            i += 1
    sf, out = rest[0], rest[1]
    keys = []
    for k in rest[2:]:
        keys.extend(k.split(","))
    if types_mode:
        sys.exit(check_types(sf, out, keys))
    sys.exit(main(sf, out, workers, keys))
