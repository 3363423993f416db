"""Property-based differential test for the as-of join.

Random (key, ts) streams on both sides — duplicate timestamps, empty sides,
single-key pileups, unmatched keys — checked against pandas ``merge_asof`` as
a THIRD independent oracle (tests/test_asof.py already checks DuckDB ASOF
JOIN and the vendored pandas reference). Both engine strategies must agree
with it row-for-row, including the matched_ts provenance column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from marmot_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),    # key
    st.integers(min_value=0, max_value=50),   # ts (long, dense -> many ties)
)
LEFTS = st.lists(ROW, min_size=0, max_size=40)
RIGHTS = st.lists(ROW, min_size=0, max_size=40)

L_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("lid", T.LongType()),
])
R_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("rts", T.LongType()),
    T.StructField("rseq", T.LongType()),
    T.StructField("val", T.DoubleType()),
])


def _pandas_oracle(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
    # merge_asof picks the LAST right row at equal ts; sorting right by
    # (rts, rseq) makes that "largest rseq wins" — the engine's tie-break
    lp = lpdf.sort_values(["ts", "lid"], kind="stable")
    rp = rpdf.sort_values(["rts", "rseq"], kind="stable")
    if len(rp) == 0:
        out = lp.copy()
        out["val"] = np.nan
        out["matched_ts"] = np.nan
        return out.sort_values("lid")[["lid", "val", "matched_ts"]]
    out = pd.merge_asof(
        lp,
        rp.rename(columns={"rts": "ts"}).assign(matched_ts=rp["rts"].values),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
    )
    return out.sort_values("lid")[["lid", "val", "matched_ts"]]


@settings(max_examples=10, deadline=None)
@given(lefts=LEFTS, rights=RIGHTS)
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    lrows = [(int(k), int(ts), i) for i, (k, ts) in enumerate(lefts)]
    rrows = [(int(k), int(ts), i, float(k * 100 + i)) for i, (k, ts) in enumerate(rights)]
    left = spark.createDataFrame(lrows, schema=L_SCHEMA) if lrows else spark.createDataFrame([], schema=L_SCHEMA)
    right = spark.createDataFrame(rrows, schema=R_SCHEMA) if rrows else spark.createDataFrame([], schema=R_SCHEMA)
    lpdf = pd.DataFrame(lrows, columns=["k", "ts", "lid"])
    rpdf = pd.DataFrame(rrows, columns=["k", "rts", "rseq", "val"])
    want = _pandas_oracle(lpdf, rpdf) if lrows else pd.DataFrame(columns=["lid", "val", "matched_ts"])

    for strategy in ["window", "merge"]:
        got = (
            asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                      payload=["val"], tie_break="rseq", strategy=strategy)
            .select("lid", "val", "matched_ts")
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), (strategy, len(got), len(want))
        if len(got) == 0:
            continue
        gv = got["val"].to_numpy(dtype=float)
        wv = want["val"].to_numpy(dtype=float)
        assert np.allclose(gv, wv, equal_nan=True), (strategy, gv, wv)
        gm = got["matched_ts"].to_numpy(dtype=float)
        wm = want["matched_ts"].to_numpy(dtype=float)
        assert np.allclose(gm, wm, equal_nan=True), (strategy, gm, wm)
