"""Config sweep for the 1->4-core raw scaling ratio (VERDICT r2 task 3).

The binding constraint is the 4-core CPU-work inflation (1.30x for identical
work = memory-stall cycles on this host's ~4 GB/s bus). Each variant below
attacks bytes-moved or CPU-per-byte on the shuffle/GC path:

  lz4 / snappy / nocompress : shuffle+spill codec CPU vs bytes trade
  shm                       : spark.local.dir on tmpfs (no disk I/O in the
                              shuffle write/read path; /tmp is disk here)
  offheap                   : Tungsten off-heap 8g (less GC scan work)
  parallelgc                : throughput collector vs default G1
  bigbuf                    : 1 MiB shuffle file buffers (fewer syscalls)

Protocol: flagship-only bench (SPARK_GRAFT_BENCH_ONLY=flagship) at the 2.4M-row
design-proxy input, taskset-pinned 4 cores, fresh JVM per run, N_RUNS runs per
variant INTERLEAVED round-robin (variant order rotates each round so host
drift hits all variants equally). Reports median wall + JVM CPU-s per variant.
The winner (if any beats baseline on CPU-s, the noise-robust metric) is then
validated with the full 1-vs-4 run_scaling.py protocol.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS: dict[str, str] = {
    "baseline": "",  # shuffle codec default is already lz4
    "snappy": "spark.io.compression.codec=snappy",
    "nocompress": "spark.shuffle.compress=false;spark.shuffle.spill.compress=false",
    "shm": "spark.local.dir=/dev/shm/spark_graft_tmp",
    "shm_nocompress": (
        "spark.local.dir=/dev/shm/spark_graft_tmp;"
        "spark.shuffle.compress=false;spark.shuffle.spill.compress=false"
    ),
    "offheap": "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=8g",
    "parallelgc": "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
    "bigbuf": "spark.shuffle.file.buffer=1m;spark.shuffle.unsafe.file.output.buffer=1m",
    # --- round-4 variants (VERDICT r3 task 5), all on top of the adopted
    # zstd shuffle default. Arrow batch size and inMemoryColumnarStorage were
    # on the suggested list but DO NOT APPLY to the flagship: its default
    # path has no Python stage (test_flagship_has_no_python_udfs) and caches
    # nothing, so neither config is exercised — noted in BENCH/BASELINE.md
    # instead of burning runs.
    "zstd3": "spark.io.compression.zstd.level=3",
    "zstd_bigbuf": "spark.io.compression.zstd.bufferSize=256k",
    "g1region32": "spark.driver.extraJavaOptions=-XX:G1HeapRegionSize=32m",
    # "offheap" above now runs on the zstd engine default = the off-heap+zstd
    # combination VERDICT r3 asked for
    "pretouch": "spark.driver.extraJavaOptions=-XX:+AlwaysPreTouch",
}


def run_once(conf: str, cpus: int, rows: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ONLY="flagship",
        SPARK_GRAFT_BENCH_ROWS=rows,
        SPARK_GRAFT_EXTRA_CONF=conf,
    )
    cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0",
           sys.executable, os.path.join(REPO, "bench.py")]
    t0 = time.time()
    res = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        return {"error": res.stderr[-500:], "wall": time.time() - t0}
    rec = json.loads(lines[-1])
    rec["wall"] = time.time() - t0
    return rec


def main():
    n_runs = int(os.environ.get("SWEEP_RUNS", "3"))
    cpus = int(os.environ.get("SWEEP_CPUS", "4"))
    rows = os.environ.get("SPARK_GRAFT_SCALING_ROWS", "2400000")
    only = sys.argv[1:] or list(VARIANTS)
    names = [n for n in VARIANTS if n in only]
    results: dict[str, list] = {n: [] for n in names}
    for i in range(n_runs):
        order = names[i % len(names):] + names[: i % len(names)]  # rotate
        for name in order:
            rec = run_once(VARIANTS[name], cpus, rows)
            results[name].append(rec)
            if "error" in rec:
                print(f"[{i}] {name}: ERROR {rec['error'][:200]}", flush=True)
            else:
                print(
                    f"[{i}] {name}: noop={rec['queries']['flagship_noop']:.2f}s "
                    f"cpu={rec.get('flagship_cpu_s', 0):.1f}s "
                    f"thr={rec['feature_rows_per_sec']:,.0f}",
                    flush=True,
                )
    print("\n== medians ==")
    summary = {}
    for name in names:
        ok = [r for r in results[name] if "error" not in r]
        if not ok:
            continue
        med_noop = statistics.median(r["queries"]["flagship_noop"] for r in ok)
        med_cpu = statistics.median(r.get("flagship_cpu_s", 0) for r in ok)
        med_thr = statistics.median(r["feature_rows_per_sec"] for r in ok)
        summary[name] = {"noop_s": round(med_noop, 2), "cpu_s": round(med_cpu, 1),
                         "thr": round(med_thr)}
        print(f"{name:16s} noop={med_noop:6.2f}s cpu={med_cpu:6.1f}s thr={med_thr:,.0f}")
    out = os.environ.get(
        "SWEEP_OUT", os.path.join(REPO, "BENCH", f"sweep_{cpus}core.json"))
    with open(out, "w") as f:
        json.dump({"cpus": cpus, "rows": rows, "runs": n_runs,
                   "summary": summary, "raw": results}, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
