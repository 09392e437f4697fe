#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle and compare (columns sorted by name, rows
sorted, exact value equality)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
verbose = "-v" in sys.argv
ok, bad = [], []
import time
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        bad.append((name, "no result dir")); continue
    try:
        got = pd.read_parquet(res_path)
        exp = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"exec error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        bad.append((name, f"cols {list(got.columns)} vs {list(exp.columns)}")); continue
    if len(got) != len(exp):
        bad.append((name, f"rows {len(got)} vs {len(exp)}")); continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    diff_cols = []
    for c in gs.columns:
        a, b = gs[c], es[c]
        try:
            same = (a.astype(str) == b.astype(str)).all()
        except Exception:
            same = False
        if not same:
            diff_cols.append(c)
    if diff_cols:
        bad.append((name, f"value mismatch in {diff_cols}"))
        for c in diff_cols[:2]:
            m = gs[c].astype(str) != es[c].astype(str)
            print(f"  [{name}.{c}] first diffs:")
            print(pd.DataFrame({"got": gs[c][m], "exp": es[c][m]}).head(3))
    else:
        ok.append(name)
    if verbose:
        print(f"[{time.time() - t0:7.1f}s] {name}", flush=True)

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        n = len(pd.read_parquet(d)) if glob.glob(d + "*.parquet") else 0
        print(f"ROWS-ONLY {name}: {n} rows" + ("" if n > 0 else "  <-- EMPTY"))

print(f"\nPASS {len(ok)}: {ok}")
print(f"FAIL {len(bad)}:")
for n, r in bad: print(f"  {n}: {r}")
sys.exit(1 if bad else 0)
