#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same fixture
tables and compare (columns sorted by name, rows sorted, values
stringified). Usage: selfcheck.py <sfdir> <verify_outdir>

Gate-integrity rules (review finds):
 - a registry query with oracle SQL but NO dumped directory is a FAIL,
   not an omission — Verify catches per-query exceptions, so a crashed
   query would otherwise vanish from a green gate;
 - an oracle-less (rows-only) query with ZERO rows is a FAIL, mirroring
   the driver's rows>0 check;
 - canon() normalizes numpy floating scalars and Decimals like Python
   floats (np.float32 is not a `float`, and str(Decimal('3.20')) is not
   '3.2000'), and uses DataFrame.map (applymap is removed in pandas 3).
"""
import sys, json, glob, os
import decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, (float, np.floating)):
            if pd.isna(v):
                return "NULL"
            return f"{float(v):.4f}"
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.4f}"
        return str(v)
    mapper = getattr(df, "map", None) or df.applymap
    out = mapper(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
    # SPARK_GRAFT_ONLY restricted dumps only check the dumped subset;
    # a FULL dump must cover every oracle key
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL  {name}: oracle present but no dump "
              f"(query crashed in Verify?)")
        n_fail += 1
    for name in sorted(dumped):
        path = os.path.join(outdir, name)
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            if len(got) == 0:
                print(f"FAIL  {name}: rows-only query returned 0 rows")
                n_fail += 1
            else:
                print(f"SKIP  {name}: no oracle ({len(got)} rows)")
                n_skip += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: {diff.sum()} differing rows, e.g.")
            for i in idx:
                print(f"      got  {g.loc[i].to_dict()}")
                print(f"      want {w.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
