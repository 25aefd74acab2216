#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf tables — the judge's
reference point for per-query Spark-vs-oracle ratios.
Usage: oracletime.py <sfdir> <verify_outdir_with_oracle_sql.json> [bench.json]"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir, benchjson=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bench = {}
    if benchjson:
        bench = json.loads(open(benchjson).readlines()[0])["queries"]
    rows = []
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                best = None
                print(f"ERR {name}: {e}")
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            rows.append((name, best, bench.get(name)))
    tot_o = sum(r[1] for r in rows)
    tot_s = sum(r[2] for r in rows if r[2])
    print(f"oracle total {tot_o:.2f}s over {len(rows)} queries; "
          f"spark total {tot_s:.2f}s; ratio {tot_s/tot_o:.2f}x")
    print("worst spark/oracle ratios (spark >= 0.5s):")
    for name, o, s in sorted(rows, key=lambda r: -(r[2] or 0) / max(r[1], 1e-3))[:15]:
        if s and s >= 0.5:
            print(f"  {s:6.2f}s vs {o:6.2f}s  {s/max(o,1e-3):6.1f}x  {name}")

if __name__ == "__main__":
    main(*sys.argv[1:])
