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
from marmot_spark.operators.asof import asof_join
from marmot_spark.operators.windows import (
    explode_with_context,
    rolling_count,
    sessionize,
)
from marmot_spark.session import build_session

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "600000"))
HEADLINE = [
    "w1_context_window", "j2_asof_backfill", "a4_rolling_count", "w6_sessionize",
    "w3_longest_ngram", "dedup_minhash_lsh", "ann_brute_force", "tpch_q1",
]


def _bench_data() -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", f"seq_{BENCH_ROWS}")
    if not os.path.exists(os.path.join(d, "sequences.parquet")):
        write_fixture_dir(d, BENCH_ROWS)
    return d


def flagship_pipeline(spark, data_dir: str):
    """As-of backfill + sessionize + rolling count + per-token context windows."""
    seqs = spark.read.parquet(f"{data_dir}/sequences.parquet")
    labels = spark.read.parquet(f"{data_dir}/labels.parquet")
    base = sessionize(seqs, "source", "seq_ts", 3600.0, order_extra=["doc_id"])
    base = rolling_count(base, "source", "seq_ts", 7200, "rolling_docs")
    base = asof_join(
        base, labels, on="doc_id", left_ts="seq_ts", right_ts="label_ts",
        payload=["tag", "score"], tie_break="label_seq",
        hot_keys=["d00000000", "d00000001"], n_salts=16,
    )
    return explode_with_context(
        base, k=2, keep=["doc_id", "seq_ts", "source", "session_id", "rolling_docs", "tag", "score"]
    )


def _time_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_dir = _bench_data()

    spark = build_session("marmot_spark_bench", master=f"local[{cpus}]")
    results: dict[str, float] = {}

    # flagship: feature-rows/sec end-to-end
    flag = flagship_pipeline(spark, data_dir)
    n_feature_rows = None
    t0 = time.time()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "flagship_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    flag.write.mode("overwrite").parquet(out_dir)
    results["flagship_sink"] = time.time() - t0
    n_feature_rows = spark.read.parquet(out_dir).count()
    results["flagship_noop"] = _time_noop(flagship_pipeline(spark, data_dir))
    rows_per_sec = n_feature_rows / results["flagship_noop"]

    qs = entrymod.queries()
    for name in HEADLINE:
        results[name] = _time_noop(qs[name](spark, sf_dir))

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
    }))
    spark.stop()


if __name__ == "__main__":
    main()
