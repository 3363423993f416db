"""Shared plumbing for iterative operators (BPE training, label propagation).

``localCheckpoint`` materializes each k-th round into executor block storage,
but ``DataFrame.unpersist()`` does NOT free a checkpointed frame's internal
RDD — only the driver's ContextCleaner does, after the superseded object is
garbage-collected on the driver. Long iterative runs therefore accumulate
one full dataset copy per checkpoint until the cleaner's periodic GC (30 min
default) fires. ``gc_hint`` nudges both collectors at checkpoint boundaries
(every k rounds, never per round), bounding live copies to ~1 between
checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def gc_hint(df: DataFrame) -> None:
    """Best-effort driver GC so the ContextCleaner reclaims superseded
    checkpoint/persist storage promptly. Never raises."""
    import gc

    gc.collect()
    try:
        df.sparkSession.sparkContext._jvm.System.gc()
    except Exception:
        pass
