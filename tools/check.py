#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name> parquet dir written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = views over
<sf_dir>/*.parquet), and compares values exactly (row-sorted,
column-name-sorted).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps → iso strings, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
            return (a is None or math.isnan(a)) and (b is None or math.isnan(b))
        return abs(float(a) - float(b)) < 1e-9
    return a == b


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    # subset Verify runs write oracle_sql.partial.json (never clobbering
    # the full oracle_sql.json) — prefer it when present
    partial = out_dir / "oracle_sql.partial.json"
    oracle_file = partial if partial.exists() else out_dir / "oracle_sql.json"
    oracle = json.loads(oracle_file.read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = out_dir / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(con.execute(f"SELECT * FROM '{spark_path}/*.parquet'").df())
        want = canon(con.execute(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # the driver hashes pandas-rendered values, so int64 vs float64
        # is a hash mismatch even when values are equal (round-1 ta_pack)
        dt_bad = [(c, got[c].dtype, want[c].dtype) for c in got.columns
                  if got[c].dtype != want[c].dtype]
        if dt_bad:
            print(f"FAIL {name}: dtypes differ (spark vs duckdb): {dt_bad}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not eq(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries with no oracle → rows-only
    for d in sorted(out_dir.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {d.name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
