"""Round-6 A/B: dedup_minhash_lsh with vs without the lazy localCheckpoint
of the signature frame (dedup._sig_frame). Interleaved, pinned, min cpu_s.

Usage: taskset -c 0-7 python BENCH/r06_minhash_ab.py [rounds=3]
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
    spark = build_session("r06_minhash_ab")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from marmot_spark.operators import dedup

    sig_ckpt = dedup._sig_frame

    def sig_plain(df, id_col, tokens_col, k_shingle, n_hashes):
        ex = df.select(
            F.col(id_col).alias("id"),
            F.explode(dedup.shingle_hashes_col(tokens_col, k_shingle)).alias("s"),
        )
        return ex.groupBy("id").agg(
            F.collect_set("s").alias("sh"),
            *[F.min(dedup._hash_k(F.col("s"), k)).alias(f"mh_{k}") for k in range(n_hashes)],
        )

    variants = {"ckpt": sig_ckpt, "plain": sig_plain}
    # warmup both
    for fn in variants.values():
        dedup._sig_frame = fn
        e._q_dedup_minhash_lsh(spark, SF).write.format("noop").mode("overwrite").save()
    res = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            dedup._sig_frame = fn
            c0, t0 = _jvm_cpu_s(), time.time()
            e._q_dedup_minhash_lsh(spark, SF).write.format("noop").mode("overwrite").save()
            m = {"wall": round(time.time() - t0, 2), "cpu_s": round(_jvm_cpu_s() - c0, 2)}
            res[name].append(m)
            print(f"r{r} {name}: {m}", flush=True)
    dedup._sig_frame = sig_ckpt
    doc = {
        k: {"runs": v, "cpu_s_min": min(x["cpu_s"] for x in v), "wall_min": min(x["wall"] for x in v)}
        for k, v in res.items()
    }
    with open(os.path.join(REPO, "BENCH", "r06_minhash_ab.json"), "w") as f:
        json.dump({"sf": SF, "rounds": rounds, "variants": doc}, f, indent=1)
    print(json.dumps(doc, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
