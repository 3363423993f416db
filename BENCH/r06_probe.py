"""Round-6 optimization probes: flagship stage decomposition + sink writer A/B.

Two modes (arg1):

  stages  — noop-time the flagship sub-DAGs to see where compute CPU goes:
              scan_count     : scan sequences + sum(size(tokens)) (I/O floor)
              explode_only   : wide scan -> explode_with_context (57M rows, no features)
              narrow_feats   : chunked rolling+sessionize+asof+dropDup on the
                               narrow frame only (600k rows)
              joinback       : wide JOIN broadcast(feats) without the explode
              full           : flagship_features end-to-end (the bench noop)
  sink    — interleaved writer A/B on the full pipeline:
              int96          : session default outputTimestampType (Spark 4.1 = INT96)
              ts_micros      : TIMESTAMP_MICROS
              ts_micros_p2m  : TIMESTAMP_MICROS + parquet.page.size=2M
              p2m            : INT96 + parquet.page.size=2M

Protocol per BENCH/BASELINE.md: taskset-pin (e.g. `taskset -c 0-7`), ONE
shared warmed JVM, variants interleaved, decide on per-variant MIN JVM CPU-s.
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

from pyspark.sql import functions as F  # noqa: E402

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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn):
    c0, t0 = _jvm_cpu_s(), time.time()
    fn()
    return {"wall": round(time.time() - t0, 2), "cpu_s": round(_jvm_cpu_s() - c0, 2)}


def _stage_frames(spark, data):
    import bench

    from marmot_spark.plans.flagship import flagship_features  # noqa: F401

    def scan_count():
        return spark.read.parquet(f"{data}/sequences.parquet").select(
            F.sum(F.size("tokens")).alias("n")
        )

    def wide():
        src_code = (
            F.when(F.col("source") == "web", 0).when(F.col("source") == "news", 1)
            .when(F.col("source") == "wiki", 2).otherwise(3).cast("tinyint")
        )
        return (
            spark.read.parquet(f"{data}/sequences.parquet")
            .select(
                F.substring("doc_id", 2, 8).cast("long").alias("doc_key"),
                "seq_ts", "tokens", src_code.alias("source_key"),
            )
        )

    def explode_only():
        from marmot_spark.operators.windows import explode_with_context

        return explode_with_context(
            wide(), k=2, keep=["doc_key", "source_key", "seq_ts"]
        )

    def full():
        return bench.flagship_pipeline(spark, data)

    def feats_only():
        # the narrow feature pipeline + join-back WITHOUT the explode:
        # temporarily neutralize explode_with_context in the flagship module
        # so the SAME construction runs minus the final Generate
        import marmot_spark.plans.flagship as fs

        orig = fs.explode_with_context
        fs.explode_with_context = lambda df, k=2, tokens_col="tokens", keep=None: df.select(
            *[c for c in (keep or df.columns) if c != tokens_col]
        )
        try:
            return bench.flagship_pipeline(spark, data)
        finally:
            fs.explode_with_context = orig

    return {
        "scan_count": scan_count,
        "explode_only": explode_only,
        "feats_only": feats_only,
        "full": full,
    }


def run_stages(spark, data, rounds):
    frames = _stage_frames(spark, data)
    res = {k: [] for k in frames}
    # warmup
    for k, mk in frames.items():
        _noop(mk())
    for r in range(rounds):
        for k, mk in frames.items():
            m = _timed(lambda: _noop(mk()))
            res[k].append(m)
            print(f"r{r} {k}: {m}", flush=True)
    return res


SINK_VARIANTS = {
    "int96": {"ts": "INT96", "opts": {}},
    "ts_micros": {"ts": "TIMESTAMP_MICROS", "opts": {}},
    "ts_micros_p2m": {"ts": "TIMESTAMP_MICROS", "opts": {"parquet.page.size": str(2 * 1024 * 1024)}},
    "p2m": {"ts": "INT96", "opts": {"parquet.page.size": str(2 * 1024 * 1024)}},
}


def run_sink(spark, data, rounds):
    import bench

    out_base = os.path.join(REPO, ".bench", "r06_sink_ab")
    res = {k: [] for k in SINK_VARIANTS}
    sizes = {}
    _noop(bench.flagship_pipeline(spark, data))  # warmup
    for r in range(rounds):
        for name, v in SINK_VARIANTS.items():
            out = os.path.join(out_base, name)
            shutil.rmtree(out, ignore_errors=True)
            spark.conf.set("spark.sql.parquet.outputTimestampType", v["ts"])
            w = bench.flagship_pipeline(spark, data).write.mode("overwrite")
            for k, val in v["opts"].items():
                w = w.option(k, val)
            m = _timed(lambda: w.parquet(out))
            res[name].append(m)
            if name not in sizes:
                sizes[name] = sum(
                    os.path.getsize(os.path.join(rr, f))
                    for rr, _, fs in os.walk(out) for f in fs
                )
            print(f"r{r} {name}: {m}", flush=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    return res, sizes


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rows = 600_000
    data = os.path.join(REPO, ".bench", f"seq_{rows}")
    from marmot_spark.fixtures import write_fixture_dir

    if not os.path.exists(os.path.join(data, "sequences.parquet")):
        write_fixture_dir(data, rows)
    spark = build_session("r06_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # bench flagship parity

    if mode == "stages":
        res = run_stages(spark, data, rounds)
        doc = {
            k: {"runs": v, "cpu_s_min": min(r["cpu_s"] for r in v), "wall_min": min(r["wall"] for r in v)}
            for k, v in res.items()
        }
        path = os.path.join(REPO, "BENCH", "r06_stages.json")
    else:
        res, sizes = run_sink(spark, data, rounds)
        doc = {
            k: {
                "runs": v,
                "cpu_s_min": min(r["cpu_s"] for r in v),
                "wall_min": min(r["wall"] for r in v),
                "mb": round(sizes[k] / 1e6, 1),
            }
            for k, v in res.items()
        }
        path = os.path.join(REPO, "BENCH", "r06_sink_ab.json")
    with open(path, "w") as f:
        json.dump({"rows": rows, "mode": mode, "pinned": os.sched_getaffinity(0).__len__(), "variants": doc}, f, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
