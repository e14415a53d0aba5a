#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, and compares: schema (column names), row count, values (rows
sorted, columns sorted by name). Dev tool only — not part of the library.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total order (NaN-safe), keep original for value compare
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"[BAD ] {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[BAD ] {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        g, w = normalize(got), normalize(want)
        # The driver's hash is sensitive to the PHYSICAL column type
        # (e.g. DuckDB HUGEINT vs Spark BIGINT hash differently even when
        # every value compares equal — the q_v14 round-9 red row). Flag
        # dtype-kind mismatches loudly; integer-width differences
        # (int32/int64) have hashed equal historically, so only warn.
        for c in g.columns:
            gk, wk = g[c].dtype.kind, w[c].dtype.kind
            if gk != wk:
                print(f"[TYPE] {name}.{c}: spark dtype {g[c].dtype} vs oracle {w[c].dtype} "
                      f"— driver hash may diverge even if values match")
        bad_cells = []
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                # timestamps: compare as pandas Timestamps
                if isinstance(x, pd.Timestamp) or isinstance(y, pd.Timestamp):
                    if pd.Timestamp(x) != pd.Timestamp(y):
                        bad_cells.append((c, i, x, y))
                elif not values_equal(x, y):
                    bad_cells.append((c, i, x, y))
                if len(bad_cells) >= 3:
                    break
            if bad_cells:
                break
        if bad_cells:
            print(f"[BAD ] {name}: {len(bad_cells)}+ cell mismatches, first: {bad_cells[0]}")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
