#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle and compare (columns sorted by name, rows
sorted, exact value equality).

Round-11 additions (VERDICT r10 Next #1/#8):
- Oracle-dump cache: each oracle result is cached as parquet under
  .oracle_cache/, keyed by md5(oracle SQL + a fingerprint of every
  testdata table file). Re-sweeps replay only queries whose SQL or
  data changed — the ~1h45m quadratic-dedup DuckDB cost is paid once
  per (SQL, data) pair, not per sweep. `--no-cache` forces replay.
- Provenance manifest: on every run the per-query outcome is recorded
  in tools/oracle_manifest.json (query -> sf -> oracle-SQL hash,
  testdata hash, rows, pass, round label from $GRAFT_ROUND) so a
  fresh judge can see which greens are from which HEAD/data.
"""
import sys, json, glob, os, hashlib, time
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
verbose = "-v" in sys.argv
use_cache = "--no-cache" not in sys.argv
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(repo, ".oracle_cache")
manifest_path = os.path.join(repo, "tools", "oracle_manifest.json")

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def data_fingerprint():
    """Content hash of every testdata table (md5 of bytes — testdata is
    small enough; size+mtime would miss an in-place regeneration)."""
    h = hashlib.md5()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        h.update(t.encode())
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()

data_md5 = data_fingerprint()

def oracle_df(name, sql, sf_name):
    """DuckDB result for `sql`, via the (sql, testdata) keyed cache.
    Entries are scoped per scale factor: eviction of a query's stale
    keys must not delete the OTHER sf's still-valid entry (alternating
    sf0.01/sf0.1 gates previously thrashed the cache to zero hits)."""
    sql_md5 = hashlib.md5(sql.encode()).hexdigest()
    key = hashlib.md5((sql_md5 + data_md5).encode()).hexdigest()[:20]
    cpath = os.path.join(cache_dir, f"{name}@{sf_name}_{key}.parquet")
    if use_cache and os.path.isfile(cpath):
        return pd.read_parquet(cpath), sql_md5, True
    df = con.execute(sql).df()
    if use_cache:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cpath + ".tmp"
        df.to_parquet(tmp)
        os.replace(tmp, cpath)
        # drop stale entries for the same (query, sf) only
        for old in glob.glob(os.path.join(cache_dir, f"{name}@{sf_name}_*.parquet")):
            if old != cpath:
                os.remove(old)
        # legacy pre-sf-scoping files ({name}_{key}.parquet) have no
        # '@'; filtering on that keeps sibling queries' CURRENT entries
        # (grid_pipeline's eviction must not delete
        # grid_pipeline_haduk@sf0.1_<key>.parquet etc.)
        for old in glob.glob(os.path.join(cache_dir, f"{name}_*.parquet")):
            if "@" not in os.path.basename(old):
                os.remove(old)
    return df, sql_md5, False

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
sf_name = os.path.basename(sf_dir.rstrip("/"))
round_label = os.environ.get("GRAFT_ROUND", "local")
manifest = {}
if os.path.isfile(manifest_path):
    try:
        manifest = json.load(open(manifest_path))
    except Exception:
        manifest = {}

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        bad.append((name, "no result dir")); continue
    cached = False
    try:
        got = pd.read_parquet(res_path)
        exp, sql_md5, cached = oracle_df(name, sql, sf_name)
    except Exception as e:
        bad.append((name, f"exec error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    verdict = None
    if list(got.columns) != list(exp.columns):
        verdict = f"cols {list(got.columns)} vs {list(exp.columns)}"
    elif len(got) != len(exp):
        verdict = f"rows {len(got)} vs {len(exp)}"
    else:
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
            verdict = f"value mismatch in {diff_cols}"
            for c in diff_cols[:2]:
                m = gs[c].astype(str) != es[c].astype(str)
                print(f"  [{name}.{c}] first diffs:")
                print(pd.DataFrame({"got": gs[c][m], "exp": es[c][m]}).head(3))
    if verdict:
        bad.append((name, verdict))
    else:
        ok.append(name)
    manifest.setdefault(name, {})[sf_name] = {
        "oracle_sql_md5": sql_md5,
        "testdata_md5": data_md5,
        "rows": int(len(got)),
        "pass": verdict is None,
        "round": round_label,
    }
    if verbose:
        tag = "cache" if cached else "duckdb"
        print(f"[{time.time() - t0:7.1f}s {tag:6s}] {name}", flush=True)

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        n = len(pd.read_parquet(d)) if glob.glob(d + "*.parquet") else 0
        print(f"ROWS-ONLY {name}: {n} rows" + ("" if n > 0 else "  <-- EMPTY"))

os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
with open(manifest_path, "w") as f:
    json.dump(manifest, f, indent=1, sort_keys=True)

print(f"\nPASS {len(ok)}: {ok}")
print(f"FAIL {len(bad)}:")
for n, r in bad: print(f"  {n}: {r}")
sys.exit(1 if bad else 0)
