#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [onlySubstr]

With onlySubstr, only oracle entries whose name contains the substring
are compared — pair it with Verify's single-query dumps to avoid the
missing-dir noise for every other query.

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all columns, and compares
values cell by cell. Dev tool only — not part of the library.

Driver-faithful: both sides are materialized through pandas (`fetchdf()`),
exactly as the driver does before hashing, so type-rendering divergence is
visible locally. In particular DuckDB types a bare integer SUM as HUGEINT,
which pandas renders as float64; if the Spark side is int64 the driver's
value hash diverges (`0` vs `0.0`) even though `fetchall()` would compare
equal. We therefore compare dtype KINDS strictly (int vs float vs object)
before comparing any values, and report a dtype mismatch as its own
failure class.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    """Sort columns by name, rows by the repr of all cells (driver-style)."""
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple(map(repr, t)))
    kinds = [df[c].dtype.kind for c in df.columns]
    return list(df.columns), kinds, rows


def scalar_na(x):
    """NA under pandas rendering: None, NaN, or NaT (fetchdf() returns
    these for SQL NULL; NaT == NaT is False, so compare NA-ness first)."""
    if x is None:
        return True
    try:
        r = pd.isna(x)
        return r if isinstance(r, bool) else False  # arrays: not a scalar NA
    except (TypeError, ValueError):
        return False


def cells_equal(a, b):
    if scalar_na(a) or scalar_na(b):
        return scalar_na(a) and scalar_na(b)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if only in k}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_bad += 1
            continue
        gc, gk, gr = canon_df(got_df)
        ec, ek, er = canon_df(exp_df)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
            continue
        # Strict dtype-kind compare: this is what the driver's pandas-side
        # hash actually sees. float64-vs-int64 here means the driver hash
        # WILL fail even if fetchall() values would compare equal.
        if gk != ek:
            diffs = [f"{c}: spark={a} oracle={b}"
                     for c, a, b in zip(gc, gk, ek) if a != b]
            print(f"FAIL {name}: dtype kind mismatch ({'; '.join(diffs)})")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            print("  spark:", gr[:3])
            print("  duckdb:", er[:3])
            n_bad += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(gr, er)):
            if not all(cells_equal(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark:  {bad[1]}\n"
                  f"  duckdb: {bad[2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
