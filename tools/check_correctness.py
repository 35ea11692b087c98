#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, sorts columns by name, and compares values. Exits nonzero and
prints a diff summary per mismatching query.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize dtypes: ints → int64, floats → float64, rest → str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s.astype(str)
    return pd.DataFrame(out).reset_index(drop=True)


def dtype_class(s: pd.Series) -> str:
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(s):
        # tz-aware vs naive is a real drift class (the parquet
        # isAdjustedToUTC flag) — norm() would silently strip the tz, so
        # classify them apart to fail loudly like int-vs-float.
        return "datetime-tz" if getattr(s.dtype, "tz", None) is not None else "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    return "other"


def cmp(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    g, w = norm(got), norm(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
        return False
    # The driver's hash is type-sensitive for int-vs-float (q12 class):
    # fail loudly on dtype-class drift instead of silently coercing.
    raw_g = got.reindex(sorted(got.columns), axis=1)
    raw_w = want.reindex(sorted(want.columns), axis=1)
    dtype_ok = True
    for c in raw_g.columns:
        cg, cw = dtype_class(raw_g[c]), dtype_class(raw_w[c])
        if cg != cw:
            print(f"FAIL {name}: dtype drift col {c}: spark={raw_g[c].dtype} ({cg}) oracle={raw_w[c].dtype} ({cw})")
            dtype_ok = False
    if not dtype_ok:
        return False
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        return False
    for c in g.columns:
        a, b = g[c], w[c]
        if pd.api.types.is_float_dtype(a):
            bad = ~((a.isna() & b.isna()) | (a == b) | ((a - b).abs() < 1e-9))
        else:
            bad = ~((a.isna() & b.isna()) | (a.eq(b)))
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(bad.sum())} bad)")
            return False
    print(f"OK   {name} ({len(g)} rows, {len(g.columns)} cols)")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result: {e}")
            failed.append(name)
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        if cmp(name, got, want):
            n_ok += 1
        else:
            failed.append(name)
    print(f"\n{n_ok}/{len(oracle)} queries match")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
