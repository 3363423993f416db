"""Scale-step memory-pressure probe (round-5 verdict task 4): run the
flagship at 10x the bench input (6M sequences -> ~570M feature rows) and
record the SHUFFLE and SPILL metrics the 100 TB plan-shape arguments rest
on — one real data point for "does the as-of sort spill gracefully, and
does the join-back hold shuffle-hash past the broadcast ceiling?".

At 6M rows the conditional join-back crosses ``broadcast_max_rows`` (5M) BY
DESIGN: the expected plan is a ShuffledHashJoin of the narrow feature frame
into the wide scan — never a SortMergeJoin (no sort of the wide rows), never
a broadcast (driver OOM class). The script asserts both on the executed plan
and fails loudly on OOM.

Metrics come from the Spark UI REST API (/api/v1) with the UI enabled for
this run only; per-stage shuffle read/write bytes, memory/disk spill, peak
execution memory, and task counts are aggregated into
BENCH/scale_step_r05.json.

Usage: python BENCH/scale_step.py  [rows]   (default 6_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from marmot_spark.fixtures import write_fixture_dir  # noqa: E402
from marmot_spark.session import build_session  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    data = os.path.join(REPO, ".bench", f"seq_{rows}")
    if not os.path.exists(os.path.join(data, "sequences.parquet")):
        t0 = time.time()
        write_fixture_dir(data, rows)
        print(f"fixture gen: {time.time() - t0:.1f}s", flush=True)

    spark = build_session(
        "scale_step", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    flag = bench.flagship_pipeline(spark, data)

    # plan assertions BEFORE paying for the run; the expected join-back
    # strategy flips at bench.flagship_pipeline's broadcast_max_rows (5M)
    plan = flag._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, "wide rows must not be sorted for the join-back"
    if rows > 5_000_000:
        assert "ShuffledHashJoin" in plan, "join-back must be shuffle-hash past the ceiling"
        assert "BroadcastHashJoin" not in plan.split("Generate")[0], (
            "the join-back must not broadcast past the ceiling"
        )
        join_back = "ShuffledHashJoin (held; no SortMergeJoin, no broadcast)"
    else:
        join_back = "BroadcastHashJoin (under the 5M-row ceiling, as designed)"

    t0 = time.time()
    flag.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_rows = rows  # feature rows counted below from stage output if available

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4047/api/v1/applications/{app_id}"
    stages = json.loads(urllib.request.urlopen(f"{base}/stages?status=complete").read())
    agg = {
        "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
        "memory_spilled_bytes": 0, "disk_spilled_bytes": 0,
        "input_bytes": 0, "n_stages": 0, "n_tasks": 0,
    }
    top = []
    for s in stages:
        agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        agg["memory_spilled_bytes"] += s.get("memoryBytesSpilled", 0)
        agg["disk_spilled_bytes"] += s.get("diskBytesSpilled", 0)
        agg["input_bytes"] += s.get("inputBytes", 0)
        agg["n_stages"] += 1
        agg["n_tasks"] += s.get("numCompleteTasks", 0)
        top.append({
            "stage": s.get("stageId"), "name": (s.get("name") or "")[:80],
            "tasks": s.get("numCompleteTasks"),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
        })
    top.sort(key=lambda r: -(r["shuffle_write_mb"] + r["spill_disk_mb"]))

    execs = json.loads(urllib.request.urlopen(f"{base}/executors").read())
    peak_mem = max(
        (e.get("peakMemoryMetrics", {}) or {}).get("OnHeapExecutionMemory", 0)
        for e in execs
    )

    out = {
        "probe": "scale_step_10x",
        "rows": rows,
        "flagship_noop_wall_s": round(wall, 1),
        "plan": {"join_back": join_back},
        "totals": {k: v for k, v in agg.items()},
        "totals_gb": {
            k: round(v / 1e9, 2) for k, v in agg.items() if k.endswith("bytes")
        },
        "peak_onheap_execution_memory_gb": round(peak_mem / 1e9, 2),
        "top_stages": top[:8],
        "host_note": "single run on a steal-prone VM; bytes/spill metrics are "
                     "deterministic-ish, wall is not",
    }
    suffix = "" if rows > 5_000_000 else f"_{rows}"
    path = os.path.join(REPO, "BENCH", f"scale_step_r05{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["totals_gb"]), flush=True)
    print(f"wall={wall:.1f}s peak_exec_mem={out['peak_onheap_execution_memory_gb']}GB "
          f"-> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
