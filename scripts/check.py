#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script runs
each oracle in DuckDB over the same parquet tables and compares frames.

Deliberately as strict as the driver: pandas frames via fetchdf (so DuckDB
HUGEINT -> float64 dtype drift is VISIBLE), columns sorted by name,
sort_values over all columns (crashes on array-typed cells, like the
driver's hasher), and dtype-sensitive exact equality. Round-4 lesson: the
old tuple-equality version passed four queries the driver failed.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob
import duckdb
import pandas as pd
from pandas.testing import assert_frame_equal

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    """Mimic the driver: name-sorted columns, full-frame sort, fresh index.
    Integer widths are unified to int64 (the driver passes int32-vs-int64,
    e.g. Spark row_number/length vs DuckDB BIGINT — r4 b07/b15) but int-vs-
    float stays a failure (the driver failed x51/x66 on exactly that).
    Raises (like the driver) if any column holds unhashable array cells."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind in "iu" and str(df[c].dtype) != "int64":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            s = canon(con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf())
            o = canon(con.execute(sql).fetchdf())
            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}")
                n_fail += 1; continue
            if len(s) != len(o):
                print(f"FAIL {name}: rowcount {len(s)} vs {len(o)}"); n_fail += 1; continue
            try:
                assert_frame_equal(s, o, check_dtype=True, check_exact=True)
                print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
            except AssertionError as e:
                first = str(e).strip().splitlines()
                print(f"FAIL {name}: {' | '.join(first[:4])}")
                dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
                      if str(s[c].dtype) != str(o[c].dtype)]
                if dt:
                    print(f"     dtype drift (spark vs oracle): {dt}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
