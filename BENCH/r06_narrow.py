"""Round-6: decompose the flagship NARROW feature pipeline (the measured
bottleneck — ~46 of ~56 JVM-CPU-s at 8 cores) into cumulative sub-DAGs.

Variants (cumulative, noop-timed, interleaved):
  chunk     : narrow scan + with_time_chunk
  rolling   : + chunked rolling_count
  sess      : + chunked sessionize
  asof      : + salted as-of join
  feats     : + select/dropDuplicates (the broadcastable feature frame)
  joinback  : wide JOIN broadcast(feats)   (no explode)

Protocol: taskset-pin, one warmed JVM, interleaved, decide on MIN cpu_s.
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


def frames(spark, data):
    from marmot_spark.operators.asof import asof_join
    from marmot_spark.operators.windows import rolling_count, sessionize, with_time_chunk

    src_code = (
        F.when(F.col("source") == "web", 0).when(F.col("source") == "news", 1)
        .when(F.col("source") == "wiki", 2).otherwise(3).cast("tinyint")
    )
    wide = (
        spark.read.parquet(f"{data}/sequences.parquet")
        .select(
            F.substring("doc_id", 2, 8).cast("long").alias("doc_key"),
            "seq_ts", "tokens", src_code.alias("source_key"),
        )
    )
    labels = spark.read.parquet(f"{data}/labels.parquet").select(
        F.when(F.col("doc_id").startswith("d"), F.substring("doc_id", 2, 8).cast("long"))
        .otherwise(-F.substring("doc_id", 2, 8).cast("long") - 1).alias("doc_key"),
        "label_ts", "label_seq",
        (F.col("tag") == "OK").cast("tinyint").alias("tag_ok"),
        F.col("score").cast("float").alias("score"),
    )
    narrow = wide.select("doc_key", "source_key", "seq_ts")

    # one plan-build collect, mirroring flagship_features
    ts_d = F.col("seq_ts").cast("double")
    probe = narrow.groupBy(
        F.lit(0).alias("__g"), F.col("source_key").cast("string").alias("__k")
    ).agg(F.min(ts_d).alias("mn"), F.max(ts_d).alias("mx")).unionByName(
        narrow.filter(F.col("doc_key").isin([0, 1]))
        .groupBy(F.lit(1).alias("__g"), F.col("doc_key").cast("string").alias("__k"))
        .agg(
            F.min(F.unix_micros("seq_ts").cast("double")).alias("mn"),
            F.max(F.unix_micros("seq_ts").cast("double")).alias("mx"),
        )
    )
    rows = probe.collect()
    bounds = {int(r["__k"]): (r["mn"], r["mx"]) for r in rows if r["__g"] == 0}
    hot_bounds_us = {int(r["__k"]): (int(r["mn"]), int(r["mx"])) for r in rows if r["__g"] == 1}

    def chunk():
        return with_time_chunk(narrow, "source_key", "seq_ts", 16, bounds=bounds)

    def rolling():
        return rolling_count(
            chunk(), "source_key", "seq_ts", 7200, "rolling_docs",
            n_chunks=16, bounds=bounds, chunk_col="__tchunk",
        )

    def sess():
        return sessionize(
            rolling(), "source_key", "seq_ts", 3600.0, order_extra=["doc_key"],
            n_chunks=16, bounds=bounds, chunk_col="__tchunk",
        ).drop("__tchunk")

    def asof():
        base = sess().withColumn("session_id", F.col("session_id").cast("int")).withColumn(
            "rolling_docs", F.col("rolling_docs").cast("int")
        )
        return asof_join(
            base, labels, on="doc_key", left_ts="seq_ts", right_ts="label_ts",
            payload=["tag_ok", "score"], tie_break="label_seq",
            hot_keys=[0, 1], n_salts=16, hot_salt_mode="range",
            hot_bounds_us=hot_bounds_us,
        )

    def feats():
        jk = ["doc_key", "source_key", "seq_ts"]
        return asof().select(*jk, "session_id", "rolling_docs", "tag_ok", "score").dropDuplicates(jk)

    def joinback():
        return wide.join(F.broadcast(feats()), ["doc_key", "source_key", "seq_ts"])

    return {
        "chunk": chunk, "rolling": rolling, "sess": sess,
        "asof": asof, "feats": feats, "joinback": joinback,
    }


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    data = os.path.join(REPO, ".bench", "seq_600000")
    spark = build_session("r06_narrow")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    fr = frames(spark, data)
    for mk in fr.values():
        _noop(mk())  # warmup/codegen
    res = {k: [] for k in fr}
    for r in range(rounds):
        for k, mk in fr.items():
            c0, t0 = _jvm_cpu_s(), time.time()
            _noop(mk())
            m = {"wall": round(time.time() - t0, 2), "cpu_s": round(_jvm_cpu_s() - c0, 2)}
            res[k].append(m)
            print(f"r{r} {k}: {m}", flush=True)
    doc = {
        k: {"runs": v, "cpu_s_min": min(x["cpu_s"] for x in v), "wall_min": min(x["wall"] for x in v)}
        for k, v in res.items()
    }
    with open(os.path.join(REPO, "BENCH", "r06_narrow.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
