#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate; NOT part of
the Scala library): run each oracle SQL from Verify's oracle_sql.json in
DuckDB over the fixture parquet, and compare against the Spark result
parquet written by graft.Verify.

Usage: oracle_check.py <sfdir> <verify_outdir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        # normalize numeric-ish types to comparable canonical forms
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]")
        out[c] = s
    return pd.DataFrame(out)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if str(av.dtype) == "object" or str(bv.dtype) == "object":
                eq = av.astype(str).fillna("<null>").equals(bv.astype(str).fillna("<null>"))
            else:
                eq = ((av.isna() & bv.isna()) | (av == bv)).all()
        except Exception as e:
            return f"COMPARE ERROR col {c}: {e}"
        if not eq:
            bad = (~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))).idxmax() \
                if len(av) else 0
            return (f"VALUE MISMATCH col {c} first-bad-row {bad}: "
                    f"spark={av.iloc[bad]!r} duck={bv.iloc[bad]!r}")
    return "OK"


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"{name}: NO SPARK RESULT ({e})")
            bad += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR ({e})")
            bad += 1
            continue
        verdict = compare(name, spark_df, duck_df)
        print(f"{name}: {verdict}")
        ok += verdict == "OK"
        bad += verdict != "OK"
    print(f"\n{ok} OK, {bad} BAD")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
