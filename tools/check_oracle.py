#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL in DuckDB against views over the sfDir
parquet tables, then compare after sorting columns by name and rows by
value. Exact match for non-floats; floats compared exactly first, then
with rel tol 1e-9 reported separately (so we know if the driver's
hash-compare would fail).
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def dclass(dt) -> str:
    """Value-format class for the driver's type-sensitive hash: int64 33
    and int32 33 both hash as '33', but float64 33.0 ('33.0') and DuckDB
    HUGEINT (object/float) do not. Flagging class mismatches makes this
    mirror predict driver hash failures the float-coerced value compare
    below would miss (the r9 blind spot: 7 value-identical gates failed
    the driver hash on HUGEINT-vs-BIGINT alone)."""
    k = dt.kind
    if k in "iu": return "int"
    if k == "f": return "float"
    if k == "b": return "bool"
    if k in "mM": return "datetime"
    return "object"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True))
        try:
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        tbad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                if dclass(got[c].dtype) != dclass(want[c].dtype)]
        if tbad:
            print(f"TYPE {name}: dtype mismatch {tbad[:4]} — driver hash WILL FAIL")
            n_fail += 1; continue
        exact = True; close = True; bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                av, bv = a.astype(float).to_numpy(), b.astype(float).to_numpy()
                import numpy as np
                same = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not same.all():
                    exact = False
                    near = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
                    if not near.all():
                        close = False; bad = (c, av[~near][:3], bv[~near][:3])
            else:
                av = a.astype(str).to_numpy(); bv = b.astype(str).to_numpy()
                if not (av == bv).all():
                    exact = close = False
                    m = av != bv
                    bad = (c, av[m][:3], bv[m][:3])
        if exact:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        elif close:
            print(f"NEAR {name}: float-only diff within 1e-9 — driver hash may FAIL"); n_fail += 1
        else:
            print(f"FAIL {name}: col {bad[0]}: got {bad[1]} want {bad[2]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
