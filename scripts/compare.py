#!/usr/bin/env python3
"""Emulate the driver's DuckDB oracle compare against a Verify dump.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: run the matching SQL from
oracle_sql.json in DuckDB over the sfDir parquet tables, sort columns by
name, sort rows, exact compare (floats atol=1e-9). Queries without oracle
SQL get a rows-only report.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out) if not d.endswith(".json"))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if only and name not in only:
            continue
        got = pd.read_parquet(f"{out}/{name}")
        if name not in oracle:
            print(f"{name}: rows_only rows={len(got)}")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE_ERR {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if len(g) != len(e):
            print(f"{name}: ROWS_MISMATCH spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"{name}: SCHEMA_MISMATCH {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            # The driver hashes exact value strings, so an int64-vs-float64
            # column ("134" vs "134.0") hash-fails even when values are
            # equal — the q79/q100 class (DuckDB sum(BIGINT) -> HUGEINT ->
            # pandas float64). Flag it here so the local gate matches.
            a_f = np.issubdtype(a.dtype, np.floating)
            b_f = np.issubdtype(b.dtype, np.floating)
            a_i = np.issubdtype(a.dtype, np.integer)
            b_i = np.issubdtype(b.dtype, np.integer)
            if (a_f and b_i) or (a_i and b_f):
                print(f"{name}: DTYPE_HASH_RISK col={c} "
                      f"spark={a.dtype} oracle={b.dtype}")
                ok = False
                break
            if a_f or b_f:
                aa = a.astype(float).to_numpy()
                bb = b.astype(float).to_numpy()
                same = (np.isclose(aa, bb, atol=1e-9, equal_nan=True)
                        | (pd.isna(a).to_numpy() & pd.isna(b).to_numpy()))
                if not same.all():
                    i = int(np.argmin(same))
                    print(f"{name}: VALUE_MISMATCH col={c} row={i} {aa[i]} vs {bb[i]}")
                    ok = False
                    break
            else:
                same = (a.astype(str).to_numpy() == b.astype(str).to_numpy()) | (
                    pd.isna(a).to_numpy() & pd.isna(b).to_numpy())
                if not same.all():
                    i = int(np.argmin(same))
                    print(f"{name}: VALUE_MISMATCH col={c} row={i} "
                          f"{a.iloc[i]!r} vs {b.iloc[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"{name}: PASS rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_rows_only}")


if __name__ == "__main__":
    main()
