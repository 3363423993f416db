"""Round-6 second-pass A/B: flagship narrow-chain window planning.

Variant trees (working-tree snapshots, engine code only — identical frozen
bench.py and identical .bench fixture bytes, symlinked):

  v0_head      = the tree at commit aa57b17 (first r6 pass shipped)
  v1_onewindow = v0 + the three chunked-rolling window frames built in ONE
                 projection, so ExtractWindowExpressions groups them under
                 one (partition, order) spec: 3 Sort+WindowExec -> 1 on the
                 main stream AND in the re-executed probe branch
  v2_sharedsort= v1 + a materialized __ous = unix_micros(ts) order column
                 shared by sessionize and rolling_count (order_col=), with
                 sessionize applied FIRST: rolling's required (entity,
                 chunk, __ous) ordering is a PREFIX of sessionize's sort on
                 the same attribute, so rolling plans no sort at all
  v3_ckpt      = v2 + lazy localCheckpoint on the sessionize output, so the
                 rolling sidebands (probes/tails) and downstream consumers
                 read the materialized narrow frame instead of re-executing
                 the sessionize subtree per branch

Protocol (BENCH/BASELINE.md): per-tree FROZEN bench.py in flagship-only
mode, fresh JVM per run, SPARK_GRAFT_FLAGSHIP_RUNS=3 in-JVM runs (min
drops the codegen-cold first run), trees INTERLEAVED per round,
taskset-pinned 8 cores, decision on per-tree MIN JVM cpu_s.

Results (r06_narrowchain_ab.json = v0/v1/v2 x3 rounds,
r06_narrowchain_ab2.json = v1/v2/v3 x4 rounds):
  v0 52.79 / v1 46.13 / v2 48.03 / v3 38.04 cpu_s_min;
  v3 beat v1 AND v2 in EVERY round of the 4-round run.

Usage: taskset -c 0-7 python BENCH/r06_narrowchain_ab.py [rounds=3]
(TREES paths were /tmp snapshots at measurement time.)
"""

import json, os, subprocess, sys, time

TREES = {
    "v0_head": "/tmp/r06_v0",
    "v1_onewindow": "/tmp/r06_v1",
    "v2_sharedsort": "/root/repo",
}

def run_once(tree):
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(len(os.sched_getaffinity(0))),
               SPARK_GRAFT_BENCH_ONLY="flagship",
               SPARK_GRAFT_FLAGSHIP_RUNS="3")
    t0 = time.time()
    res = subprocess.run([sys.executable, os.path.join(tree, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=1800, cwd=tree)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(res.stdout[-2000:], res.stderr[-2000:])
        raise RuntimeError(f"no json from {tree}")
    rec = json.loads(lines[-1])
    cpus = [r["cpu_s"] for r in rec["runs"]["flagship_noop"]]
    walls = [r["wall"] for r in rec["runs"]["flagship_noop"]]
    return {"wall_total": round(time.time() - t0, 1), "noop_walls": walls,
            "noop_cpus": cpus, "cpu_min": min(cpus), "wall_min": min(walls)}

def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {k: [] for k in TREES}
    for r in range(rounds):
        for name, tree in TREES.items():
            m = run_once(tree)
            res[name].append(m)
            print(f"round{r} {name}: cpu_min={m['cpu_min']} wall_min={m['wall_min']} cpus={m['noop_cpus']}", flush=True)
    doc = {name: {"runs": v,
                  "cpu_s_min": min(x["cpu_min"] for x in v),
                  "wall_min": min(x["wall_min"] for x in v)}
           for name, v in res.items()}
    with open("/tmp/r06_narrowchain_ab.json", "w") as f:
        json.dump({"rounds": rounds, "pinned": len(os.sched_getaffinity(0)),
                   "trees": TREES, "result": doc}, f, indent=1)
    print(json.dumps(doc, indent=1))

if __name__ == "__main__":
    main()
