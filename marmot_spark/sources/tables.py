"""TableIO seam: Iceberg-shaped table layer with a parquet+manifest fallback.

The deployment target is an Iceberg catalog (BASELINE.json input_hint); this
sandbox has no Iceberg runtime jar (SURVEY.md §7.6), so TableIO exposes the
same snapshot-pinned contract over both backends:

* backend="iceberg": spark.read.format("iceberg") with VERSION AS OF —
  exercised only when the runtime jar is present (import-guarded).
* backend="parquet": directory-per-snapshot emulation —
  <root>/<table>/snap=<id>/part-*.parquet plus _snapshot.json manifest and a
  _COMMITTED marker written last (atomic visibility: readers only see
  snapshots whose marker exists).

All checkpoint/lineage logic (checkpoint.py) keys on snapshot_id, so the real
Iceberg binding is a drop-in.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str, backend: str = "parquet"):
        self.spark = spark
        self.root = root
        self.backend = backend
        if backend == "iceberg" and not self._iceberg_available():
            raise RuntimeError("iceberg runtime not on classpath; use backend='parquet'")

    def _iceberg_available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")  # noqa: SLF001
            return True
        except Exception:
            return False

    # -- snapshot management ---------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def snapshots(self, table: str) -> list[int]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("snap=") and os.path.exists(os.path.join(d, name, "_COMMITTED")):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def latest_snapshot(self, table: str) -> int | None:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    # -- read / write ----------------------------------------------------------

    def write(self, df: DataFrame, table: str, mode: str = "append", partition_by: list[str] | None = None) -> int:
        if self.backend == "iceberg":
            w = df.writeTo(f"{self.root}.{table}")
            (w.createOrReplace() if mode == "overwrite" else w.append())
            return -1  # iceberg assigns its own snapshot id
        snap_id = int(time.time() * 1000)
        path = os.path.join(self._table_dir(table), f"snap={snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        manifest = {
            "snapshot_id": snap_id,
            "table": table,
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
            "parent": self.latest_snapshot(table),
        }
        with open(os.path.join(path, "_snapshot.json"), "w") as f:
            json.dump(manifest, f)
        # commit marker written LAST -> readers never see partial snapshots
        with open(os.path.join(path, "_COMMITTED"), "w") as f:
            f.write("1")
        return snap_id

    def read(self, table: str, version_as_of: int | None = None) -> DataFrame:
        if self.backend == "iceberg":
            r = self.spark.read.format("iceberg")
            if version_as_of is not None:
                r = r.option("snapshot-id", str(version_as_of))
            return r.load(f"{self.root}.{table}")
        snap = version_as_of if version_as_of is not None else self.latest_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r} under {self.root}")
        if snap not in self.snapshots(table):
            raise FileNotFoundError(f"snapshot {snap} of {table!r} not committed")
        return self.spark.read.parquet(os.path.join(self._table_dir(table), f"snap={snap}"))
