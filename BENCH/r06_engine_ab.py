"""VERDICT r5 task 1: same-window engine A/B — r4 close vs r5 close vs r6
HEAD flagship noop, to settle the cpu_s_min 101.5-vs-130 discrepancy.

Protocol: each engine tree runs ITS OWN frozen bench.py in flagship-only
mode (fresh JVM per run, in-JVM warmup pass inside bench.py's protocol is
absent in flagship_only mode — the single noop run there IS preceded by the
count job only, so we run SPARK_GRAFT_FLAGSHIP_RUNS=3 and take the min,
which drops the codegen-cold first run), trees INTERLEAVED (r4, r5, r6,
r4, ...) so host drift hits all three equally, taskset-pinned, identical
600k-row fixture bytes (symlinked .bench). Decision on per-engine MIN
cpu_s across all runs.

Usage: taskset -c 0-7 python BENCH/r06_engine_ab.py [rounds=3]
Requires /tmp/r4tree and /tmp/r5tree worktrees (git worktree add).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TREES = {
    "r4_e3d6445": "/tmp/r4tree",
    "r5_4b2ca0b": "/tmp/r5tree",
    "r6_head": REPO,
}


def run_once(tree: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(len(os.sched_getaffinity(0))),
        SPARK_GRAFT_BENCH_ONLY="flagship",
        SPARK_GRAFT_FLAGSHIP_RUNS="3",
    )
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, cwd=tree,
    )
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    cpus = [r["cpu_s"] for r in rec["runs"]["flagship_noop"]]
    walls = [r["wall"] for r in rec["runs"]["flagship_noop"]]
    return {
        "wall_total": round(time.time() - t0, 1),
        "noop_walls": walls,
        "noop_cpus": cpus,
        "cpu_min": min(cpus),
        "wall_min": min(walls),
    }


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {k: [] for k in TREES}
    for r in range(rounds):
        for name, tree in TREES.items():
            m = run_once(tree)
            res[name].append(m)
            print(f"round{r} {name}: cpu_min={m['cpu_min']} wall_min={m['wall_min']} "
                  f"cpus={m['noop_cpus']}", flush=True)
    doc = {
        name: {
            "runs": v,
            "cpu_s_min": min(x["cpu_min"] for x in v),
            "wall_min": min(x["wall_min"] for x in v),
        }
        for name, v in res.items()
    }
    with open(os.path.join(REPO, "BENCH", "r06_engine_ab.json"), "w") as f:
        json.dump({"rounds": rounds, "pinned": len(os.sched_getaffinity(0)),
                   "trees": {k: v for k, v in TREES.items()}, "result": doc}, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
