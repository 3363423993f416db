"""Leakage-safe encoder tests: pandas-reference parity, the temporal-leakage
invariance property (future labels must not move past encodings), plan-shape
audits (one WindowExec when composed on a shared spec), and the chained
as-of vs sequential-asof / pandas merge_asof parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marmot_spark.operators.encoders import (
    asof_chain,
    cap_per_group,
    decay_features,
    target_encode_past,
    temporal_split_embargo,
)


def _events_pdf() -> pd.DataFrame:
    rows = []
    for uid in range(6):
        for i in range(40):
            rows.append(
                {
                    "event_id": uid * 1000 + i,
                    "user_id": uid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=7 * i + uid),
                    "value_c": ((uid * 37 + i * 13) % 500) + 1,
                }
            )
    return pd.DataFrame(rows)


def _te_reference(pdf: pd.DataFrame, m: int = 10) -> pd.DataFrame:
    total = int(pdf["value_c"].sum())
    cnt = int(pdf["value_c"].count())
    prior_q = (total * 1_000_000) // max(cnt, 1)
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        s = 0
        n = 0
        for _, r in g.iterrows():
            smooth = (s * 1_000_000 + m * prior_q) // (n + m)
            out.append((r["event_id"], n, s, smooth))
            s += int(r["value_c"])
            n += 1
    return pd.DataFrame(out, columns=["event_id", "te_cnt", "te_sum", "te_smooth_q"])


def test_target_encode_past_matches_python_reference(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        target_encode_past(df, "user_id", "ts", "value_c", order_extra=["event_id"])
        .select("event_id", "te_cnt", "te_sum", "te_smooth_q")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _te_reference(pdf).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_target_encode_no_temporal_leakage(spark):
    """Perturbing every label at/after a cut time must leave all encodings
    strictly before the cut unchanged — the zero-leakage contract."""
    pdf = _events_pdf()
    cut = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=7 * 20)
    perturbed = pdf.copy()
    perturbed.loc[perturbed["ts"] >= cut, "value_c"] += 99_999

    def run(p):
        # the smoothing PRIOR is corpus-global (it sees all labels by
        # design); pin it so the test isolates the per-row frame
        df = spark.createDataFrame(p)
        out = target_encode_past(df, "user_id", "ts", "value_c", order_extra=["event_id"])
        return (
            out.filter(F.col("ts") < F.lit(str(cut)).cast("timestamp"))
            .select("event_id", "te_cnt", "te_sum")
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(pdf), run(perturbed))


def test_decay_features_exact_and_past_only(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        decay_features(df, "user_id", "ts", "value_c", k=4, order_extra=["event_id"])
        .select("event_id", "decay_q")
        .toPandas()
        .set_index("event_id")["decay_q"]
    )
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        vals = list(g["value_c"])
        ids = list(g["event_id"])
        for i, eid in enumerate(ids):
            want = sum(
                vals[i - j] * (1 << (4 - j)) for j in range(1, 5) if i - j >= 0
            )
            assert got[eid] == want
    # first row of every user sees nothing: strictly past-only
    firsts = pdf.sort_values(["ts", "event_id"]).groupby("user_id").head(1)["event_id"]
    assert all(got[e] == 0 for e in firsts)


def test_encoders_share_one_window_exchange(spark):
    """te_* + decay_q + a plain lag on the SAME (key, order) spec must plan
    a single Exchange on the key (windows fused), never one per encoder."""
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    out = target_encode_past(df, "user_id", "ts", "value_c", order_extra=["event_id"])
    out = decay_features(out, "user_id", "ts", "value_c", k=4, order_extra=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange hashpartitioning(user_id")
    assert n_exch == 1, plan


def test_asof_chain_two_tables(spark):
    spine = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2, 2],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 12:00", "2024-01-01 11:00", "2024-01-01 13:00"]
                ),
                "event_id": [1, 2, 3, 4],
            }
        )
    )
    errs = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 2],
                "err_ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 12:30"]),
                "err_v": [10, 20],
            }
        )
    )
    buys = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2],
                "buy_ts": pd.to_datetime(
                    ["2024-01-01 09:00", "2024-01-01 11:30", "2024-01-01 10:30"]
                ),
                "buy_v": [100, 200, 300],
            }
        )
    )
    out = asof_chain(
        spine,
        "ts",
        [
            {"right": errs, "on": "user_id", "right_ts": "err_ts", "payload": ["err_v"]},
            {"right": buys, "on": "user_id", "right_ts": "buy_ts", "payload": ["buy_v"]},
        ],
    ).toPandas().sort_values("event_id")
    assert list(out["err_v"].fillna(-1)) == [10, 10, -1, 20]
    assert list(out["buy_v"].fillna(-1)) == [100, 200, 300, 300]
    # pandas merge_asof cross-check on the second table
    ref = pd.merge_asof(
        spine.toPandas().sort_values("ts"),
        buys.toPandas().sort_values("buy_ts"),
        left_on="ts",
        right_on="buy_ts",
        by="user_id",
    ).sort_values("event_id")
    assert list(ref["buy_v"]) == list(out["buy_v"])


def test_asof_chain_rejects_payload_collision(spark):
    df = spark.range(1).select(
        F.lit(1).alias("user_id"), F.current_timestamp().alias("ts")
    )
    r = df.select("user_id", F.col("ts").alias("rts"), F.lit(1).alias("x"))
    with pytest.raises(ValueError, match="collides"):
        asof_chain(
            df,
            "ts",
            [
                {"right": r, "on": "user_id", "right_ts": "rts", "payload": ["x"]},
                {"right": r, "on": "user_id", "right_ts": "rts", "payload": ["x"]},
            ],
        )


def test_temporal_split_embargo(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    out = temporal_split_embargo(
        df, "ts", "2024-01-01 01:00:00", "2024-01-01 02:00:00"
    ).toPandas()
    t = pd.Timestamp
    assert (out.loc[out["ts"] < t("2024-01-01 01:00:00"), "split_time"] == "train").all()
    assert (out.loc[out["ts"] >= t("2024-01-01 02:00:00"), "split_time"] == "test").all()
    mid = out[(out["ts"] >= t("2024-01-01 01:00:00")) & (out["ts"] < t("2024-01-01 02:00:00"))]
    assert (mid["split_time"] == "embargo").all()
    assert len(mid) > 0
    with pytest.raises(ValueError, match="embargo"):
        temporal_split_embargo(df, "ts", "2024-01-02", "2024-01-01")


def test_cap_per_group_deterministic_bound(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    a = cap_per_group(df, "user_id", 7, "event_id", seed=3).toPandas()
    kept = a[a["cap_keep"]].groupby("user_id")["event_id"].apply(set)
    assert all(len(s) == 7 for s in kept)
    # content-stable: a reshuffled input elects the SAME survivors
    b = cap_per_group(
        spark.createDataFrame(pdf.sample(frac=1.0, random_state=1)).repartition(7),
        "user_id", 7, "event_id", seed=3,
    ).toPandas()
    kept_b = b[b["cap_keep"]].groupby("user_id")["event_id"].apply(set)
    assert dict(kept) == dict(kept_b)


def test_token_budget_sample(spark):
    """Kept weight per group never exceeds budget; kept rows form a PREFIX
    of the hash order (no skip-and-fill); content-stable under reshuffle;
    budget=0 keeps nothing."""
    import pandas as pd
    from marmot_spark.functions.splits import split_hash_col, token_budget_sample
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "doc_id": range(120),
            "grp": [f"g{i % 4}" for i in range(120)],
            "w": [(i * 31 + 7) % 90 + 10 for i in range(120)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = token_budget_sample(df, "grp", "w", 400, seed=2).withColumn(
        "h", split_hash_col("doc_id", seed=2)
    ).toPandas()
    for g, gg in out.groupby("grp"):
        kept = gg[gg["budget_keep"]]
        assert kept["w"].sum() <= 400
        gg = gg.sort_values(["h", "doc_id"]).reset_index(drop=True)
        flags = list(gg["budget_keep"])
        assert flags == sorted(flags, reverse=True), f"non-prefix keep in {g}"
        assert flags[0], "first row of each group must fit (weights < budget)"
    again = token_budget_sample(
        spark.createDataFrame(pdf.sample(frac=1.0, random_state=9)).repartition(5),
        "grp", "w", 400, seed=2,
    ).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["budget_keep_a"] == merged["budget_keep_b"]).all()
    assert not token_budget_sample(df, "grp", "w", 0).toPandas()["budget_keep"].any()
