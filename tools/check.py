#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only; the
library itself is pure Scala/Spark). Runs DuckDB on oracle_sql.json
against the same parquet tables and compares with the Verify output.

Usage: python tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        mine = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
        fails += 1
        continue
    # sort rows for order-independent compare, then exact value match
    cols = list(mine.columns)
    mine_s = mine.sort_values(cols).reset_index(drop=True)
    ref_s = ref.sort_values(cols).reset_index(drop=True)
    if len(mine_s) != len(ref_s):
        print(f"FAIL {name}: rows {len(mine_s)} vs {len(ref_s)}")
        fails += 1
        continue
    eq = mine_s.equals(ref_s)
    if not eq:
        dt_bad = [(c, str(mine_s[c].dtype), str(ref_s[c].dtype))
                  for c in cols if str(mine_s[c].dtype) != str(ref_s[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            fails += 1
            continue
        diff = (mine_s != ref_s) & ~(mine_s.isna() & ref_s.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {name}: {bad.sum()} differing rows, e.g.:")
        print(mine_s[bad].head(3))
        print(ref_s[bad].head(3))
        fails += 1
    else:
        # also check row order matches (in case driver is order-sensitive)
        ordered = mine.reset_index(drop=True).equals(ref.reset_index(drop=True))
        print(f"PASS {name} ({len(ref_s)} rows{'' if ordered else ', ORDER DIFFERS'})")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
