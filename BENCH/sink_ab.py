"""Interleaved A/B probe for flagship SINK writer options (round 5).

The sink run is ~75% of bench.py's headline `value` (47 s of 63 s in the r5
preview), and the parquet WRITER options (dictionary encoding, page size)
were never probed — only codec (zstd, r2) and level (1, r3), both adopted.
Dictionary encoding is a real candidate either way: the feature matrix's
int32 token/feature columns draw from a 50k vocab (dictionary halves
pre-codec bytes but adds an indexing pass that zstd may make redundant).

Protocol (host-quirk hygiene per BENCH/BASELINE.md): taskset-pinned 8 cores
(steal hits 32-thread runs hardest), ONE shared JVM warmed once, variants
INTERLEAVED x3, decision on per-variant MINIMUM JVM CPU-s (steal only
inflates); bytes written reported per variant (at 10^12 rows the byte count
is a first-class cost, not a tiebreak).

Usage: taskset -c 0-7 python BENCH/sink_ab.py [rows=600000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from marmot_spark.fixtures import write_fixture_dir  # noqa: E402
from marmot_spark.session import build_session  # noqa: E402


def _jvm_cpu_s() -> float:
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                if b"java" not in f.read():
                    continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            total += (int(parts[13]) + int(parts[14])) / hz
        except OSError:
            continue
    return total


VARIANTS = {
    "default_dict_on": {},
    "p2m": {"parquet.page.size": str(2 * 1024 * 1024)},
}

N_ROUNDS = int(os.environ.get("SINK_AB_ROUNDS", "3"))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    data = os.path.join(REPO, ".bench", f"seq_{rows}")
    if not os.path.exists(os.path.join(data, "sequences.parquet")):
        write_fixture_dir(data, rows)

    spark = build_session("sink_ab")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    out_base = os.path.join(REPO, ".bench", "sink_ab")
    results: dict[str, list] = {k: [] for k in VARIANTS}
    sizes: dict[str, int] = {}

    # warmup: codegen-compile the full plan once (untimed)
    bench.flagship_pipeline(spark, data).write.format("noop").mode("overwrite").save()

    for rnd in range(N_ROUNDS):
        for name, opts in VARIANTS.items():
            out = os.path.join(out_base, name)
            shutil.rmtree(out, ignore_errors=True)
            w = bench.flagship_pipeline(spark, data).write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            c0, t0 = _jvm_cpu_s(), time.time()
            w.parquet(out)
            wall, cpu = time.time() - t0, _jvm_cpu_s() - c0
            results[name].append({"wall": round(wall, 2), "cpu_s": round(cpu, 2)})
            if name not in sizes:
                sizes[name] = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(out) for f in fs
                )
            print(f"r{rnd} {name}: wall={wall:.2f}s cpu={cpu:.2f}s", flush=True)

    summary = {
        name: {
            "runs": results[name],
            "cpu_s_min": min(r["cpu_s"] for r in results[name]),
            "wall_min": min(r["wall"] for r in results[name]),
            "bytes": sizes[name],
            "mb": round(sizes[name] / 1e6, 1),
        }
        for name in VARIANTS
    }
    path = os.path.join(REPO, "BENCH", "sink_ab_r05.json")
    with open(path, "w") as f:
        json.dump({"rows": rows, "pinned_cores": 8, "variants": summary}, f, indent=1)
    for name, s in summary.items():
        print(f"{name}: cpu_min={s['cpu_s_min']} wall_min={s['wall_min']} mb={s['mb']}")
    print(f"-> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
