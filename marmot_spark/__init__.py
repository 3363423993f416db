"""marmot_spark — a from-scratch PySpark-native point-in-time feature-engineering engine.

Re-expresses the computational capabilities of the qe-team/marmot word-level
QE feature-extraction toolkit (see SURVEY.md) as idiomatic Spark DataFrame
plans: as-of label backfill, token context windows (lag/lead with sentinel
padding), alignment-derived lags, n-gram/LM membership features, rolling
counts, sessionization, deterministic one-hot binarization — plus the
large-scale training-data-pipeline operators (dedup, ANN similarity, text
quality, multimodal plumbing) a 100 TB corpus pipeline needs.

Design rules (BASELINE.json input_hint):
  * DataFrame/SQL only — no RDDs.
  * Vectorized pandas/Arrow UDFs only where built-ins can't express the
    semantics (the as-of kernel); never per-row Python.
  * Fixed schemas at every boundary.
  * Sentinel token ids: START=-1, END=-2, UNALIGNED=-3 (FIXTURES.md).
"""

START_ID = -1
END_ID = -2
UNALIGNED_ID = -3

__version__ = "0.1.0"
