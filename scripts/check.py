#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script runs
each oracle in DuckDB over the same parquet tables and compares values.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def load_spark(con, path):
    files = glob.glob(f"{path}/*.parquet")
    if not files: return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall(), \
           [d[0] for d in con.execute(f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = load_spark(con, f"{out_dir}/{name}")
            if got is None:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            srows, scols = got
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            # driver sorts columns by name before hashing
            sidx = sorted(range(len(scols)), key=lambda i: scols[i])
            oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
            if sorted(scols) != sorted(ocols):
                print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}"); n_fail += 1; continue
            s = [tuple(norm_cell(r[i]) for i in sidx) for r in srows]
            o = [tuple(norm_cell(r[i]) for i in oidx) for r in orows]
            if len(s) != len(o):
                print(f"FAIL {name}: rowcount {len(s)} vs {len(o)}"); n_fail += 1; continue
            if s == o:
                print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
            elif sorted(map(repr, s)) == sorted(map(repr, o)):
                print(f"FAIL {name}: values match but ROW ORDER differs"); n_fail += 1
            else:
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b][:3]
                print(f"FAIL {name}: value diff, first: {bad}"); n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
