#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: for each SparkEntry query dumped
by graft.Verify to OUTDIR/<name>/ (parquet), run the matching oracle SQL from
OUTDIR/oracle_sql.json in DuckDB over the same testdata parquet tables, and
compare rows / schema / values (columns sorted by name, rows sorted, exact
value equality). Usage: check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            # Exact first; fall back to a tight relative tolerance so a
            # round(x, 6) landing exactly on a rounding boundary (computed
            # from order-dependent double summation) can't flake the gate.
            import math
            af, bf = float(a), float(b)
            return af == bf or math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # dtype check (loose: both int-ish / both float-ish / both other)
        kind = lambda s: ("i" if s.dtype.kind in "iu" else
                          "f" if s.dtype.kind == "f" else
                          "M" if s.dtype.kind == "M" else "o")
        bad = [c for c in got.columns if kind(got[c]) != kind(want[c])]
        if bad:
            print(f"FAIL {name}: dtype mismatch {[(c, got[c].dtype, want[c].dtype) for c in bad]}")
            n_fail += 1
            continue
        neq = None
        for c in got.columns:
            ga, wa = got[c].to_numpy(), want[c].to_numpy()
            mism = [i for i in range(len(ga)) if not cell_eq(ga[i], wa[i])]
            if mism:
                neq = (c, mism[0], ga[mism[0]], wa[mism[0]], len(mism))
                break
        if neq:
            c, i, g, w, n = neq
            print(f"FAIL {name}: col {c} row {i}: spark={g!r} duck={w!r} ({n} cells differ)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
