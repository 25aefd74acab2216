#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf tables — the judge's
reference point for per-query Spark-vs-oracle ratios.
Usage: oracletime.py <sfdir> <verify_outdir_with_oracle_sql.json> \
           [bench.json] [emit.json]
With emit.json (conventionally oracle_latest.json at the repo root),
writes an env-stamped per-query snapshot beside the bench artifact so
ratio drift is visible round-over-round without a judge re-derivation."""
import os, sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def envsnap():
    load = os.getloadavg()[0]
    mem_avail_mb = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    mem_avail_mb = int(line.split()[1]) // 1024
                    break
    except OSError:
        pass
    return {"load": round(load, 2), "mem_avail_mb": mem_avail_mb}

def quiet_window(max_load=1.0, wait_sec=180, poll_sec=15):
    """Round-12 guard: wait (bounded) for a quiet box before timing.
    Returns True when the 1-min loadavg is under max_load — the caller
    refuses to emit a committed snapshot otherwise, so every committed
    oracle_latest.json's own env stamp proves it quiet."""
    deadline = time.time() + wait_sec
    ld = os.getloadavg()[0]
    while ld > max_load and time.time() < deadline:
        print(f"[oracletime] load {ld:.2f} > {max_load} — "
              f"waiting for a quiet window", file=sys.stderr)
        time.sleep(poll_sec)
        ld = os.getloadavg()[0]
    return ld <= max_load

def main(sfdir, outdir, benchjson=None, emitjson=None):
    quiet = quiet_window(
        max_load=float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0")),
        wait_sec=int(os.environ.get("SPARK_GRAFT_QUIET_WAIT_SEC", "180")))
    if not quiet and emitjson:
        print(f"[oracletime] box never quieted; timing anyway, "
              f"{emitjson} refresh SKIPPED", file=sys.stderr)
        emitjson = None
    env_start = envsnap()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bench = {}
    if benchjson:
        bench = json.load(open(benchjson))["queries"]
    rows = []
    for name, sql in sorted(oracle.items()):
        best = None
        for attempt in range(2):
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                # keep a valid first-run timing if the retry fails
                print(f"ERR {name} (attempt {attempt + 1}): {e}")
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            rows.append((name, best, bench.get(name)))
    # ratio over the MATCHED set only (a query timed in the oracle but
    # absent/errored in bench must not inflate the denominator)
    both = [r for r in rows if r[2] is not None]
    tot_o = sum(r[1] for r in both)
    tot_s = sum(r[2] for r in both)
    if both and tot_o > 0:
        print(f"oracle total {tot_o:.2f}s over {len(both)} matched queries; "
              f"spark total {tot_s:.2f}s; ratio {tot_s/tot_o:.2f}x")
    else:
        print(f"no matched spark/oracle timings "
              f"({len(rows)} oracle queries timed)")
    print("worst spark/oracle ratios (spark >= 0.5s):")
    slow = [r for r in both if r[2] >= 0.5]
    for name, o, s in sorted(slow, key=lambda r: -r[2] / max(r[1], 1e-3))[:15]:
        print(f"  {s:6.2f}s vs {o:6.2f}s  {s/max(o,1e-3):6.1f}x  {name}")
    if emitjson:
        snap = {
            "sf": sfdir,
            "bench_source": benchjson,
            "oracle_sec": {n: round(o, 4) for n, o, _ in rows},
            "matched": {
                "n": len(both),
                "oracle_total_sec": round(tot_o, 3),
                "spark_total_sec": round(tot_s, 3),
                "ratio": round(tot_s / tot_o, 3) if tot_o > 0 else None,
            } if both else None,
            "env_start": env_start,
            "env_end": envsnap(),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        }
        with open(emitjson, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {emitjson}")

if __name__ == "__main__":
    main(*sys.argv[1:])
