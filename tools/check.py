#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares: column names (sorted), row counts, and exact
values after sorting rows. Strictest plausible interpretation of the
driver's hash compare — if this passes, the driver's check should too.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_kind(s: pd.Series) -> str:
    """Driver-visible dtype class. The driver's hash is type-sensitive, so an
    int64-vs-float64 (or int-vs-HUGEINT-widened) mismatch must FAIL here, not
    be coerced away. Datetime resolution (ns vs us) is normalized — both
    engines emit parquet timestamps the driver reads uniformly."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return str(s.dtype)


def dtype_mismatches(got: pd.DataFrame, want: pd.DataFrame):
    out = []
    for c in sorted(set(got.columns) & set(want.columns)):
        a, b = dtype_kind(got[c]), dtype_kind(want[c])
        if a != b:
            out.append(f"col {c}: spark dtype {a} != oracle dtype {b}")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(qdir, "*.parquet")):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_raw = pd.read_parquet(qdir)
            want_raw = con.sql(oracle[name]).df()
            mism = dtype_mismatches(got_raw, want_raw)
            got, want = canon(got_raw), canon(want_raw)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism))
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
        diffs = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if pd.api.types.is_float_dtype(got[c]):
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = pd.Series(a).eq(pd.Series(b)) | (pd.isna(a) & pd.isna(b))
                eq = eq.values
            if not eq.all():
                i = int(np.argmin(eq))
                diffs.append(f"col {c}: row {i}: {a[i]!r} != {b[i]!r} "
                             f"({int((~eq).sum())} rows differ)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
