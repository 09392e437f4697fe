#!/usr/bin/env python3
"""Pooled-min bench protocol (the committed bench artifact of record).

Single-sweep per-query deltas under ~+/-15% are unattributable on this
host: r12's own evidence was a +6.2% median shift on dozens of
UNTOUCHED queries between rounds, three same-code full runs spreading
125.7-133.1 s, and ScaleBench stages moving 2-3x under neighbor steal
(/proc/stat steal counter). The estimator that survives that noise is
the POOLED PER-QUERY MINIMUM over >=2 independent full runs (separate
JVMs, so no shared JIT state): contention only ever ADDS time, so the
min is the cleanest per-query point, and pooling across runs keeps one
contended sweep from contaminating every query it touched.

Usage:
    python3 tools/bench_pool.py [runs] [sf_dir] [out_json]
defaults: 2 runs, /root/testdata/sf0.1, bench_full.json

Writes out_json with the SAME top-level schema a single graft.Bench
sweep produces ("metric"/"value"/"unit"/"queries"/"sf") so every
existing reader keeps working, plus a "pool" object recording each
run's total, per-run load averages, and /proc/stat steal deltas -- the
provenance a later reader needs to judge how contended the runs were.
"""
import json, os, subprocess, sys, time

def probe_induced_steal():
    """Loaded calm probe: spin 8 threads for 3 s and report the steal
    ticks/s the load ITSELF induces. r15 host forensics: steal on this
    box is substantially self-induced under load (an oversubscription
    throttle, ~16-20% of demanded CPU when neighbors are active), so an
    idle steal reading does not predict a sweep's contamination — only
    a loaded probe does."""
    def read_steal():
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    return int(line.split()[8])
        return -1
    s1 = read_steal()
    procs = [subprocess.Popen(
        ["timeout", "3", "sh", "-c", "while :; do :; done"]) for _ in range(8)]
    time.sleep(3.5)
    for p in procs:
        p.wait()
    return (read_steal() - s1) / 3.0

def wait_for_calm(budget_sec, calm_rate=12.0):
    """Poll the loaded probe until it reads calm or the budget runs
    out; returns the last probe reading. Launching a sweep into a calm
    stretch is the single biggest lever on pool quality (r14: all 8
    sweeps contended; r15: the one near-calm sweep set most minima)."""
    deadline = time.time() + budget_sec
    while True:
        r = probe_induced_steal()
        if r <= calm_rate or time.time() >= deadline:
            return r
        print(f"  waiting for calm (probe {r:.0f} ticks/s induced, "
              f"{int(deadline - time.time())}s budget left)", flush=True)
        time.sleep(45)

CALM_WAIT = int(os.environ.get("BENCH_POOL_CALM_WAIT", "300"))

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out_path = sys.argv[3] if len(sys.argv) > 3 else "bench_full.json"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# a run whose steal delta exceeds this is CONTENDED: schedule one extra
# sweep per such run (bounded), so the pool always contains at least one
# comparably-calm run when the box allows it
STEAL_GATE = int(os.environ.get("BENCH_POOL_STEAL_GATE", "3000"))
MAX_EXTRA = int(os.environ.get("BENCH_POOL_MAX_EXTRA", "2"))

run_jsons = []
i = 0
extra_left = MAX_EXTRA
while i < runs:
    if CALM_WAIT > 0:
        pr = wait_for_calm(CALM_WAIT)
        print(f"launching sweep {len(run_jsons)} (probe {pr:.0f} ticks/s)",
              flush=True)
    tmp = f"/tmp/bench_pool_run{len(run_jsons)}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_OUT=tmp)
    t0 = time.time()
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=repo, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if r.returncode != 0 or not os.path.exists(tmp):
        sys.exit(f"run {len(run_jsons)} failed (rc={r.returncode})")
    with open(tmp) as f:
        d = json.load(f)
    run_jsons.append(d)
    steal = d["load"].get("steal_end", -1) - d["load"].get("steal_start", 0)
    print(f"run {len(run_jsons)-1}: total {d['value']:.1f}s "
          f"wall {time.time()-t0:.0f}s steal_delta {steal}", flush=True)
    if steal > STEAL_GATE and extra_left > 0:
        extra_left -= 1
        print(f"  contended (steal {steal} > {STEAL_GATE}): "
              f"adding an extra sweep ({extra_left} left)", flush=True)
    else:
        i += 1

names = set()
for d in run_jsons:
    names |= set(d["queries"])
pooled = {}
spread = {}
for q in sorted(names):
    vals = [d["queries"][q] for d in run_jsons if q in d["queries"]]
    pooled[q] = min(vals)
    spread[q] = {"min": min(vals), "max": max(vals), "n": len(vals)}

total = sum(pooled.values())
out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": pooled, "sf": sf_dir,
    "pool": {
        "protocol": "per-query min over independent full runs (median-of-3 trials inside each run)",
        "runs": len(run_jsons),
        "runs_requested": runs,
        "run_totals": [d["value"] for d in run_jsons],
        "run_loads": [d["load"] for d in run_jsons],
        "steal_deltas": [d["load"].get("steal_end", -1) - d["load"].get("steal_start", 0)
                         for d in run_jsons],
        "per_query_run_spread": spread,
    },
}
with open(os.path.join(repo, out_path) if not os.path.isabs(out_path) else out_path, "w") as f:
    json.dump(out, f)
    f.write("\n")
print(f"pooled total {total:.1f}s over {len(run_jsons)} runs -> {out_path}")
