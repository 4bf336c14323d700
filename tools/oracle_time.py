#!/usr/bin/env python3
"""Dev-only harness: time every oracle SQL (the DuckDB side of the
correctness gate) and write a BASELINE json artifact so the bench-vs-
oracle ratio is measurable per round (VERDICT r1 task 5 — without a
recorded oracle wall-time the 2x bench bar is unfalsifiable).

Usage: oracle_time.py <sfdir> <verify_outdir> <out_json> [reps]

Each query runs `reps` times (default 3) single-threaded-ish (DuckDB
default parallelism — the same configuration oracle_check.py uses) and
the MINIMUM wall time is recorded (min over reps isolates plan cost
from cache warm-up noise). Queries without an oracle are absent, same
as the correctness artifact.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        print(f"{name}: {best:.3f}s")
    total = round(sum(times.values()), 4)
    out = {
        "metric": "duckdb_oracle_total",
        "value": total,
        "unit": "sec",
        "sf": sfdir,
        "reps": reps,
        "queries": times,
    }
    with open(outjson, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\ntotal {total}s over {len(times)} oracle queries -> {outjson}")


if __name__ == "__main__":
    main()
