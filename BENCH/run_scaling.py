"""Two-cluster-size scaling evidence (sandbox form per BASELINE.md):

Runs bench.py at local[8] and local[32] on the SAME cached input (N vs 4N
cores as the proxy for N vs 4N executors), 3 runs each, reports median
throughput for both plus efficiency = (thr_32 / thr_8) / 4 into
BENCH/BASELINE.md. Uses spark-submit --py-files engine.zip when available
(the north rule's deployment form), plain python otherwise.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_engine_zip() -> str:
    zpath = os.path.join(REPO, ".bench", "engine.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "marmot_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return zpath


def run_bench(cpus: int, runs: int = 3) -> list[dict]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    spark_submit = shutil.which("spark-submit")
    zpath = build_engine_zip()
    out = []
    for i in range(runs):
        if spark_submit:
            cmd = [spark_submit, "--master", f"local[{cpus}]", "--py-files", zpath,
                   "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
                   os.path.join(REPO, "bench.py")]
        else:
            cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        t0 = time.time()
        res = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        rec["wall"] = time.time() - t0
        print(f"local[{cpus}] run {i}: feature_rows_per_sec={rec['feature_rows_per_sec']} "
              f"flagship_noop={rec['queries']['flagship_noop']}s via {'spark-submit' if spark_submit else 'python'}")
        out.append(rec)
    return out


def main():
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    n_a = int(os.environ.get("SPARK_GRAFT_SCALE_A", "2"))
    n_b = int(os.environ.get("SPARK_GRAFT_SCALE_B", "8"))
    r8 = run_bench(n_a, runs)
    r32 = run_bench(n_b, runs)
    thr8 = statistics.median(r["feature_rows_per_sec"] for r in r8)
    thr32 = statistics.median(r["feature_rows_per_sec"] for r in r32)
    eff = (thr32 / thr8) / (n_b / n_a)
    md = f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.md): same job, same cached input ({r8[0]['bench_rows']} sequence rows
-> {r8[0]['feature_rows']} feature rows), flagship as-of-join + window-features
pipeline, {runs} runs per parallelism, median reported. `spark.sql.shuffle.partitions`
scales with cores (build_session). Executed via {'spark-submit --py-files engine.zip' if shutil.which('spark-submit') else 'python (spark-submit unavailable)'}.

| parallelism | feature-rows/sec (median) | flagship secs (median) |
|---|---|---|
| local[{n_a}]  (N)  | {thr8:,.0f} | {statistics.median(r['queries']['flagship_noop'] for r in r8):.2f} |
| local[{n_b}] (4N) | {thr32:,.0f} | {statistics.median(r['queries']['flagship_noop'] for r in r32):.2f} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** (target >= 0.8)

Raw runs:
```json
{json.dumps({'local8': r8, 'local32': r32}, indent=1)}
```
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"\nefficiency={eff:.3f} -> {out}")


if __name__ == "__main__":
    main()
