#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
corresponding SQL from oracle_sql.json in DuckDB with views named after
the tables in <sfDir>, sorts columns by name and rows by all columns,
and compares cell values (floats to 1e-9 rel tolerance after rounding
already applied in-query).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive UTC strings for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(glob.glob(f"{out_dir}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        got = pd.read_parquet(name)
        if qname not in oracle:
            status = f"rows-only rows={len(got)}"
            ok = len(got) > 0
        else:
            want = con.sql(oracle[qname]).df()
            g, w = norm(got), norm(want)
            # the driver hash-compares typed values, so int64 `6` vs
            # float64 `6.0` is a MISMATCH there (e.g. DuckDB sum(int) ->
            # HUGEINT -> pandas float64). Flag dtype-kind drift loudly.
            kind = lambda s: {"i": "int", "u": "int", "f": "float"}.get(s.dtype.kind, s.dtype.kind)
            dty = [(c, kind(g[c]), kind(w[c])) for c in g.columns
                   if c in w.columns and kind(g[c]) != kind(w[c])]
            if list(g.columns) != list(w.columns):
                ok, status = False, f"SCHEMA got={list(g.columns)} want={list(w.columns)}"
            elif dty:
                ok, status = False, f"DTYPE {dty[:4]}"
            elif len(g) != len(w):
                ok, status = False, f"ROWS got={len(g)} want={len(w)}"
            else:
                bad = [(i, c, g.iloc[i][c], w.iloc[i][c])
                       for i in range(len(g)) for c in g.columns
                       if not cells_equal(g.iloc[i][c], w.iloc[i][c])]
                ok = not bad
                status = "match" if ok else f"VALUES {bad[:3]}"
        n_pass += ok
        n_fail += (not ok)
        print(f"{'PASS' if ok else 'FAIL'} {qname}: {status}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
