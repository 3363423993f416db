"""Round-6 A/B: w3_longest_ngram dictionary construction — three per-order
passes (r5 form) vs one tagged aggregation behind a lazy localCheckpoint
(r6 form). Interleaved, pinned, min cpu_s.

Usage: taskset -c 0-7 python BENCH/r06_w3_ab.py [rounds=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F  # noqa: E402

from marmot_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session("r06_w3_ab")
    spark.sparkContext.setLogLevel("FATAL")

    import __spark_entry__ as e
    from marmot_spark.operators.ngrams import with_ngram_membership
    from marmot_spark.operators.windows import explode_tokens

    def mk_old():
        ex = explode_tokens(e._docs(spark, SF), keep=["doc_id"])
        dicts = [e._ngram_dict(spark, SF, 1, 5), e._ngram_dict(spark, SF, 2, 3),
                 e._ngram_dict(spark, SF, 3, 2)]
        d = dicts[0].unionByName(dicts[1]).unionByName(dicts[2])
        out = with_ngram_membership(ex, d, max_n=3)
        return out.select("doc_id", "pos", "tok", "in_lm_1", "in_lm_2", "in_lm_3", "longest_ngram")

    def mk_new():
        return e._q_w3_longest_ngram(spark, SF)

    variants = {"old_3pass": mk_old, "new_ckpt": mk_new}
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
    res = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            c0, t0 = _jvm_cpu_s(), time.time()
            fn().write.format("noop").mode("overwrite").save()
            m = {"wall": round(time.time() - t0, 2), "cpu_s": round(_jvm_cpu_s() - c0, 2)}
            res[name].append(m)
            print(f"r{r} {name}: {m}", flush=True)
    doc = {
        k: {"runs": v, "cpu_s_min": min(x["cpu_s"] for x in v), "wall_min": min(x["wall"] for x in v)}
        for k, v in res.items()
    }
    with open(os.path.join(REPO, "BENCH", "r06_w3_ab.json"), "w") as f:
        json.dump({"sf": SF, "rounds": rounds, "variants": doc}, f, indent=1)
    print(json.dumps(doc, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
