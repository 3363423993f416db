"""Checkpointed, idempotent-resume job runner with per-partition lineage
manifests and metrics (SURVEY.md S7 / §4.2; required by the north rule).

The reference has no resume story — a failed experiment reruns from scratch.
At 10^12 rows a job MUST survive preemption, so the engine processes a
snapshot as deterministic BUCKETS (pmod(xxhash64(key), n_buckets)) and commits
each bucket atomically:

    <ckpt_root>/<job>/snap=<id>/bucket=<b>/part-*.parquet   (data)
    <ckpt_root>/<job>/snap=<id>/_manifests/bucket=<b>.json  (lineage, LAST)

A bucket is done iff its manifest exists; the manifest is written only after
the data write succeeds, so a crash mid-bucket leaves data files without a
manifest and the bucket simply reruns (mode=overwrite makes the rerun
idempotent — same input snapshot + same deterministic bucketing = same rows).

resume = anti-join of pending buckets against committed manifests: run() is
restartable at any point and never reprocesses a committed bucket. Manifests
carry (snapshot_id, bucket, input_rows, output_rows, checksum, wall_ms) —
the lineage + metrics record the north rule asks for.

Design note: buckets, not Spark task partitions, are the checkpoint unit —
task counts change with AQE/cluster size, while pmod(hash(key)) bucketing is
stable across runs and cluster shapes.

Scale note: align buckets with STORAGE — store the snapshot partitioned by a
bucket column (Iceberg ``bucket(n, key)`` transform) and pass ``bucket_col=``
to ``run()`` so every per-bucket job partition-prunes its scan; the N bucket
jobs then read each input byte once in total instead of N full scans.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class CheckpointedJob:
    def __init__(self, ckpt_root: str, job: str, snapshot_id: int, n_buckets: int = 32):
        self.root = os.path.join(ckpt_root, job, f"snap={snapshot_id}")
        self.snapshot_id = snapshot_id
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(self.root, "_manifests"), exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.root, "_manifests", f"bucket={bucket}.json")

    def committed_buckets(self) -> set[int]:
        d = os.path.join(self.root, "_manifests")
        return {
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(d)
            if f.startswith("bucket=") and f.endswith(".json")
        }

    def pending_buckets(self) -> list[int]:
        done = self.committed_buckets()
        return [b for b in range(self.n_buckets) if b not in done]

    def manifests(self) -> list[dict]:
        return [json.load(open(self._manifest_path(b))) for b in sorted(self.committed_buckets())]

    # -- execution -----------------------------------------------------------

    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        bucket_key: str,
        fail_after: int | None = None,
        bucket_col: str | None = None,
        verify_readback: bool = False,
    ) -> list[int]:
        """Process all pending buckets; returns the buckets committed this call.

        ``fail_after`` aborts after N buckets (test hook for kill/resume).

        ``bucket_col``: name of an EXISTING column that already holds the
        bucket id (values 0..n_buckets-1). This is the 100 TB path: when the
        input table is stored partitioned by that column (Iceberg
        ``bucket(n, key)`` partition transform, or parquet
        ``partitionBy(bucket_col)``), the per-bucket equality filter
        partition-prunes at the scan, so the N per-bucket jobs together read
        each input byte ONCE. Without it the computed-hash filter cannot
        prune and every bucket job rescans the full input (fine for small
        snapshots, quadratic-ish waste at scale).

        Lineage metrics (input_rows, output_rows, checksum) ride the write
        job as ``df.observe`` aggregates — ONE pass per bucket, no extra
        count() scan and no output re-read. ``verify_readback=True`` adds an
        audit re-read of the written files and cross-checks row count and
        checksum against the observed values (storage round-trip proof; off
        by default because it re-reads the full output).

        CAVEAT — multi-scan transforms: observe metrics count rows per PASS
        through the observe node. A ``transform`` whose plan scans its input
        more than once (self-join, un-cached reuse) inflates input_rows by
        the scan count, and one that re-executes its own output subtree
        inflates output_rows/checksum the same way. For such transforms
        either ``.cache()`` the input inside the transform, or treat the
        manifest metrics as per-pass totals; ``verify_readback=True`` will
        surface an output-side inflation as a (deliberate, loud) mismatch
        because the files on disk are the single-pass truth.
        """
        if bucket_col is not None:
            # validate ONCE that the storage bucketing matches the job config:
            # out-of-range or null bucket ids would match no per-bucket filter
            # and be silently dropped while every manifest still commits
            stats = source.select(
                F.min(bucket_col).alias("mn"),
                F.max(bucket_col).alias("mx"),
                F.sum(F.col(bucket_col).isNull().cast("long")).alias("nulls"),
            ).first()
            if stats["nulls"] and stats["nulls"] > 0:
                raise ValueError(f"bucket_col {bucket_col!r} has {stats['nulls']} NULL ids")
            if stats["mn"] is not None and (stats["mn"] < 0 or stats["mx"] >= self.n_buckets):
                raise ValueError(
                    f"bucket_col {bucket_col!r} range [{stats['mn']}, {stats['mx']}] outside "
                    f"[0, {self.n_buckets}) — storage bucketing disagrees with n_buckets"
                )
            bucketed = source.withColumnRenamed(bucket_col, "__bucket")
        else:
            bucketed = source.withColumn(
                "__bucket", F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(self.n_buckets)).cast("int")
            )
        committed = []
        for i, b in enumerate(self.pending_buckets()):
            if fail_after is not None and i >= fail_after:
                raise RuntimeError(f"injected failure after {fail_after} buckets")
            t0 = time.time()
            obs_in, obs_out = Observation(), Observation()
            part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
            part = part.observe(obs_in, F.count(F.lit(1)).alias("n"))
            out = transform(part)
            out = out.observe(
                obs_out,
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.pmod(F.xxhash64(*sorted(out.columns)), F.lit(1_000_000_007))
                ).alias("checksum"),
            )
            path = os.path.join(self.root, f"bucket={b}")
            out.write.mode("overwrite").parquet(path)
            in_rows = int(obs_in.get["n"])
            out_rows = int(obs_out.get["n"])
            checksum = obs_out.get["checksum"]
            checksum = int(checksum) if checksum is not None else 0
            if verify_readback:
                written = source.sparkSession.read.parquet(path)
                rb = written.select(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.pmod(F.xxhash64(*sorted(written.columns)), F.lit(1_000_000_007))
                    ).alias("checksum"),
                ).first()
                rb_sum = int(rb["checksum"]) if rb["checksum"] is not None else 0
                if int(rb["n"]) != out_rows or rb_sum != checksum:
                    raise RuntimeError(
                        f"bucket {b} readback mismatch: wrote {out_rows}/{checksum}, "
                        f"read {int(rb['n'])}/{rb_sum}"
                    )
            manifest = {
                "snapshot_id": self.snapshot_id,
                "bucket": b,
                "input_rows": in_rows,
                "output_rows": out_rows,
                "checksum": checksum,
                "wall_ms": int((time.time() - t0) * 1000),
            }
            tmp = self._manifest_path(b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, self._manifest_path(b))  # atomic commit marker
            committed.append(b)
        return committed

    def read_output(self, spark) -> DataFrame:
        done = sorted(self.committed_buckets())
        if len(done) != self.n_buckets:
            raise RuntimeError(f"snapshot incomplete: {len(done)}/{self.n_buckets} buckets committed")
        return spark.read.parquet(*[os.path.join(self.root, f"bucket={b}") for b in done])
