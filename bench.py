"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "feature_rows_per_sec": ...}

The flagship metric is feature-rows/sec end-to-end for the as-of join +
window-features pipeline over a seeded synthetic ``sequences``+``labels``
pair at bench scale (BASELINE.json), generated once and cached under
.bench/ so every run (and both parallelism levels of the scaling protocol)
reads identical bytes. Headline driver-table queries run via the same
``queries()`` registry the correctness gate uses.

Timing uses the "noop" sink (full computation, no disk skew); the flagship
additionally does a real parquet write (sink cost included in flagship_sink).
Both flagship timings follow the scaling protocol (BASELINE.md): one untimed
warmup pass first, so one-time JVM/codegen startup — which amortizes to ~0 at
design scale — is excluded from steady-state numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from marmot_spark.fixtures import write_fixture_dir
from marmot_spark.session import build_session

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "600000"))
# Headline queries keep their per-VARIANT identity across rounds (the r5
# registry composed same-family variants into suites for driver coverage;
# timing the suites would change what each key measures), so the bench
# resolves the per-variant construction functions directly.
HEADLINE = [
    "w1_context_window", "j2_asof_backfill", "a4_rolling_count", "w6_sessionize",
    "w3_longest_ngram", "dedup_minhash_lsh", "ann_brute_force", "tpch_q1",
    # r5 additions: the sketch paths (CMS heavy-hitter columns inside the
    # vocab aggregate; HLL distinct inside the set-ops query)
    "a2_vocab_counts", "set_ops_vocab_overlap",
]


def _bench_data() -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", f"seq_{BENCH_ROWS}")
    if not os.path.exists(os.path.join(d, "sequences.parquet")):
        write_fixture_dir(d, BENCH_ROWS)
    return d


def flagship_pipeline(spark, data_dir: str, broadcast_max_rows: int = 5_000_000):
    """As-of backfill + sessionize + rolling count + per-token context windows
    via the SHARED construction site (marmot_spark/plans/flagship.py — also
    consumed by the driver's ``entry()``, so the two gates cannot drift; the
    narrow-projection / one-collect / shared-chunk-exchange / conditional
    join-back engineering lives there).

    Bench-specific hot-path hygiene kept here at the scan: strings are
    dictionary-encoded to ints (doc_id "dNNNNNNNN" -> long, source ->
    tinyint, tag -> tinyint) so every shuffle/sort/explode moves fixed-width
    integers, not UTF8 — the per-feature-row payload is ~60B instead of
    ~120B, halving what the 57M-row explode pays. source has 4 values with a
    55%-hot key: n_chunks=16 keeps the per-entity ordered passes parallel
    (4 entities x 16 chunks = 64 tasks); doc_keys 0/1 are the salted as-of
    hot keys.
    """
    from marmot_spark.plans.flagship import flagship_features

    src_code = (
        F.when(F.col("source") == "web", 0).when(F.col("source") == "news", 1)
        .when(F.col("source") == "wiki", 2).otherwise(3).cast("tinyint")
    )
    seqs = (
        spark.read.parquet(f"{data_dir}/sequences.parquet")
        .select(
            F.substring("doc_id", 2, 8).cast("long").alias("doc_key"),
            "seq_ts", "tokens", src_code.alias("source_key"),
        )
    )
    labels = spark.read.parquet(f"{data_dir}/labels.parquet").select(
        F.when(F.col("doc_id").startswith("d"), F.substring("doc_id", 2, 8).cast("long"))
        .otherwise(-F.substring("doc_id", 2, 8).cast("long") - 1).alias("doc_key"),
        "label_ts", "label_seq",
        (F.col("tag") == "OK").cast("tinyint").alias("tag_ok"),
        F.col("score").cast("float").alias("score"),  # ML-feature precision
    )
    return flagship_features(
        seqs, labels,
        keys=["doc_key", "source_key"], ts_col="seq_ts", entity_col="source_key",
        asof_on="doc_key", right_ts="label_ts", payload=["tag_ok", "score"],
        tie_break="label_seq", rolling_window_s=7200, session_gap_s=3600.0,
        order_extra=["doc_key"], n_chunks=16, hot_keys=[0, 1], n_salts=16,
        broadcast_max_rows=broadcast_max_rows, k_context=2,
    )


def _time_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _time_noop_median(mk_df, runs: int = 3) -> float:
    """Median of `runs` executions (fresh DataFrame each, so no result reuse).

    Single-shot headline timings proved noise-bound on this host: r2 published
    tpch_q1 at 1.32s where the true warm cost is ~0.18s (BENCH/probe_q1.py —
    first execution pays per-query codegen, and the VM's wall clock swings
    2-3x with hypervisor neighbors). The median of three absorbs both; the
    first run still includes codegen, so the median is a slight over-estimate,
    never flattery."""
    import statistics

    return statistics.median(_time_noop(mk_df()) for _ in range(runs))


def _jvm_pids() -> list[int]:
    """All Spark JVMs in this process's tree: the py4j child (or spark-submit
    parent) in local mode, plus worker/executor JVMs in local-cluster mode
    (they are descendants of the gateway JVM)."""
    me, parent = os.getpid(), os.getppid()
    procs = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().split()
            procs[int(p)] = (parts[1], int(parts[3]))
        except OSError:
            continue

    def in_tree(pid: int) -> bool:
        seen = set()
        while pid > 1 and pid not in seen:
            if pid in (me, parent):
                return True
            seen.add(pid)
            pid = procs.get(pid, ("", 0))[1]
        return False

    return [p for p, (comm, _) in procs.items() if "java" in comm and in_tree(p)]


def _host_probe() -> dict:
    """Host-state marker: 1-min loadavg + cumulative hypervisor-steal ticks.

    This VM's wall clock swings 2-3x with hypervisor neighbors and shows
    PHANTOM load (loadavg >> 0 with zero local processes) during steal
    periods — see BENCH/BASELINE.md hazards. Recording loadavg and the
    /proc/stat steal counter before/after the measurement lets a reader of
    the bench artifact separate engine deltas from host deltas without any
    out-of-band notes."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    ticks = [int(x) for x in parts[1:]]
    return {
        "loadavg1": round(os.getloadavg()[0], 2),
        "steal_ticks": ticks[7] if len(ticks) > 7 else 0,
        "total_ticks": sum(ticks),
    }


def _host_state(start: dict, end: dict) -> dict:
    dt = max(end["total_ticks"] - start["total_ticks"], 1)
    steal_pct = 100.0 * (end["steal_ticks"] - start["steal_ticks"]) / dt
    degraded = start["loadavg1"] > 2.0 or steal_pct > 2.0
    return {
        "loadavg1_start": start["loadavg1"],
        "loadavg1_end": end["loadavg1"],
        "steal_pct": round(steal_pct, 2),
        "degraded": degraded,
    }


def _prev_round() -> dict | None:
    """Newest BENCH_r*.json the driver recorded, for the in-artifact
    cross-round comparability verdict."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return None
    try:
        with open(best) as f:
            doc = json.load(f)
        doc = doc.get("parsed", doc)  # driver wraps the JSON line
        return {
            "file": os.path.basename(best),
            "flagship_noop": doc.get("queries", {}).get("flagship_noop"),
            "flagship_cpu_s": doc.get("flagship_cpu_s"),
            "feature_rows_per_sec": doc.get("feature_rows_per_sec"),
        }
    except (OSError, ValueError):
        return None


def _comparability(host: dict, runs: dict, prev: dict | None) -> str:
    """One-line verdict a reader can act on without opening BENCH/BASELINE.md."""
    cpus = [r["cpu_s"] for r in runs.get("flagship_noop", []) if r.get("cpu_s") is not None]
    spread = (max(cpus) / max(min(cpus), 1e-9)) if len(cpus) >= 2 else 1.0
    bits = []
    if host["degraded"]:
        bits.append(
            f"HOST DEGRADED during this run (loadavg {host['loadavg1_start']}->"
            f"{host['loadavg1_end']}, steal {host['steal_pct']}%): wall times measure "
            "the host, not the engine"
        )
    else:
        bits.append(
            f"host calm (loadavg {host['loadavg1_start']}->{host['loadavg1_end']}, "
            f"steal {host['steal_pct']}%)"
        )
    if spread > 1.5:
        bits.append(
            f"per-run CPU spread {spread:.1f}x for identical work — steal bursts "
            "inside the run; compare cpu_s_min across rounds, not the mean"
        )
    if prev and prev.get("flagship_cpu_s") is not None and cpus:
        bits.append(
            f"cpu_s_min {min(cpus):.1f} vs {prev['file']} flagship_cpu_s "
            f"{prev['flagship_cpu_s']} (prev value is a per-run MEAN and may embed "
            "steal; this artifact's per-run array is the reconcilable form)"
        )
    return "; ".join(bits)


def _jvm_cpu_s(pids) -> float:
    """Cumulative CPU seconds (utime+stime) across the given JVMs.

    Re-resolves the pid set at read time so executor JVMs that appeared after
    the first snapshot are counted; exited executors lose their accumulated
    time (acceptable: bench JVMs live for the whole measurement)."""
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for pid in set(pids) | set(_jvm_pids()):
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            total += (int(parts[13]) + int(parts[14])) / hz
        except OSError:
            continue
    return total


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_dir = _bench_data()

    # SPARK_GRAFT_MASTER overrides the thread-mode default — e.g.
    # "local-cluster[4,1,6144]" runs 4 SEPARATE single-core executor JVMs
    # (the literal N-executors form of the scaling criterion)
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    spark = build_session("marmot_spark_bench", master=master)
    results: dict[str, float] = {}

    # Flagship plan is explicitly partitioned (entity x time-chunk) and
    # explicitly salted for hot keys — AQE's runtime re-planning adds a
    # materialization barrier per exchange (this plan has ~10) with nothing
    # left to re-plan; measured steadier and ~15% faster off. Headline
    # queries below re-enable it (their joins use AQE's runtime stats).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # flagship: feature-rows/sec end-to-end. Timed window includes plan
    # construction (the chunk-bounds collect is real work the job pays).
    host_start = _host_probe()
    runs: dict[str, list] = {"flagship_noop": [], "flagship_sink": []}
    flagship_only = os.environ.get("SPARK_GRAFT_BENCH_ONLY") == "flagship"
    if flagship_only:
        # scaling-protocol mode: feature rows = one per token, so the count is
        # a scan aggregate; the untimed noop pass is the JVM/codegen warmup —
        # one-time startup amortizes to ~0 over the 10^12-row design target,
        # so steady-state throughput is the honest scaling quantity
        n_feature_rows = (
            spark.read.parquet(f"{data_dir}/sequences.parquet")
            .agg(F.sum(F.size("tokens"))).collect()[0][0]
        )
        flagship_pipeline(spark, data_dir).write.format("noop").mode("overwrite").save()
    else:
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "flagship_out")
        shutil.rmtree(out_dir, ignore_errors=True)
        # one untimed warmup pass (same protocol as BENCH/run_scaling.py): the
        # first flagship execution pays one-time JVM/codegen compilation that
        # amortizes to ~0 at the 10^12-row design scale — steady-state cost is
        # the honest sink quantity
        flagship_pipeline(spark, data_dir).write.format("noop").mode("overwrite").save()
        c0 = _jvm_cpu_s(_jvm_pids())
        t0 = time.time()
        flagship_pipeline(spark, data_dir).write.mode("overwrite").parquet(out_dir)
        results["flagship_sink"] = time.time() - t0
        runs["flagship_sink"].append({
            "wall": round(results["flagship_sink"], 3),
            "cpu_s": round(_jvm_cpu_s(_jvm_pids()) - c0, 2),
        })
        n_feature_rows = spark.read.parquet(out_dir).count()
    # flagship noop: median of FLAGSHIP_RUNS timed executions (warmup already
    # done above). One-shot timing published a 2.4x phantom regression in r2
    # on this noise-prone host; CPU-s is still reported for the whole block
    # divided by runs (the noise-robust quantity).
    n_runs = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_RUNS", "1" if flagship_only else "3"))
    jvm = _jvm_pids()
    walls = []
    for _ in range(n_runs):
        c0 = _jvm_cpu_s(jvm)
        t0 = time.time()
        flagship_pipeline(spark, data_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        walls.append(wall)
        runs["flagship_noop"].append({
            "wall": round(wall, 3),
            "cpu_s": round(_jvm_cpu_s(jvm) - c0, 2),
        })
    import statistics

    results["flagship_noop"] = statistics.median(walls)
    # per-run CPU is the reconcilable quantity on this steal-prone host: the
    # MEAN of the per-run cpu_s equals the old aggregate form, the MIN is the
    # least-steal-contaminated run (cross-round comparable)
    noop_cpus = [r["cpu_s"] for r in runs["flagship_noop"]]
    flagship_cpu_s = round(sum(noop_cpus) / len(noop_cpus), 2)
    rows_per_sec = n_feature_rows / results["flagship_noop"]

    if not flagship_only:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for name in HEADLINE:
            fn = getattr(entrymod, f"_q_{name}")
            results[name] = _time_noop_median(lambda: fn(spark, sf_dir))

    host = _host_state(host_start, _host_probe())
    prev = _prev_round()
    total = sum(results.values())
    print(json.dumps({
        "metric": "feature-rows/sec end-to-end (as-of join + window features) + headline query secs",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "sf": sf_dir,
        "cpus": int(cpus),
        "bench_rows": BENCH_ROWS,
        "feature_rows": n_feature_rows,
        "feature_rows_per_sec": round(rows_per_sec, 1),
        "flagship_cpu_s": flagship_cpu_s,
        "flagship_cpu_s_min": round(min(noop_cpus), 2) if noop_cpus else None,
        "runs": runs,
        "host": host,
        "prev_round": prev,
        "comparability": _comparability(host, runs, prev),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
