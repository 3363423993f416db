"""Capture .explain("formatted") for round-6 touched queries into plans/r06/.

Usage: python BENCH/r06_plans.py before|after [query ...]
Defaults to every query in QUERIES. Flagship uses the bench construction
(bench.flagship_pipeline) — the exact DAG the frozen bench times.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from marmot_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "flagship", "w1_context_window", "j2_asof_backfill", "a4_rolling_count",
    "w6_sessionize", "w3_longest_ngram", "dedup_minhash_lsh", "ann_brute_force",
    "tpch_q1", "a2_vocab_counts", "set_ops_vocab_overlap",
]


def plan_text(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or QUERIES
    spark = build_session("r06_plans")
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    import __spark_entry__ as entrymod

    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name == "flagship":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            df = bench.flagship_pipeline(spark, bench._bench_data())
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            df = getattr(entrymod, f"_q_{name}")(spark, SF)
        txt = plan_text(df)
        p = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(txt)
        print(f"{p}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('BatchEvalPython') + txt.count('ArrowEvalPython')} PythonEval")
    spark.stop()


if __name__ == "__main__":
    main()
