"""Pin the r2 tpch_q1 bench regression (0.555s -> 1.323s, VERDICT r2 task 2).

Hypotheses: (a) host noise (this VM swings 2-3x run-to-run), (b) session
contamination — tpch_q1 runs LAST in bench.py's headline list, after the
flagship + minhash/ann queries have filled the JVM with broadcast blocks and
codegen caches, (c) a real plan regression.

Method: one bench-shaped session (build_session, local[32], AQE on for
headline queries), time tpch_q1 noop N times FIRST (cold-ish), then run the
other headline queries once, then time tpch_q1 N times again (bench
position). Separately `--fresh` times it in a brand-new session. Medians
decide; plan printed once for the record.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from marmot_spark.session import build_session


def t_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("PROBE_RUNS", "7"))
    spark = build_session("probe_q1", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    qs = entrymod.queries()

    q1 = lambda: qs["tpch_q1"](spark, sf)  # noqa: E731
    q1().write.format("noop").mode("overwrite").save()  # warmup/codegen
    early = [t_noop(q1()) for _ in range(n)]
    print(f"early: median={statistics.median(early):.3f} runs={[round(x,3) for x in early]}", flush=True)

    for name in ["w1_context_window", "j2_asof_backfill", "a4_rolling_count",
                 "w6_sessionize", "w3_longest_ngram", "dedup_minhash_lsh",
                 "ann_brute_force"]:
        t = t_noop(qs[name](spark, sf))
        print(f"  {name}: {t:.3f}", flush=True)

    late = [t_noop(q1()) for _ in range(n)]
    print(f"late (bench position): median={statistics.median(late):.3f} runs={[round(x,3) for x in late]}", flush=True)
    q1().explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
