"""IBM Model 1 EM training + Viterbi alignment: parity with a pure-python
reference EM (allclose — float probabilities, the north rule's comparison
class), the classic convergence example, and the full two-direction
train -> align -> grow-diag-final pipeline."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from marmot_spark.operators.ibm1 import NULL_ID, train_ibm1, viterbi_align

# toy parallel corpus (int ids): src "language" 0..3, tgt 10..13
SENTS = [
    ([0, 1], [10, 11]),   # la maison | the house
    ([0, 2], [10, 12]),   # la fleur  | the flower
    ([1], [11]),          # maison    | house
    ([0, 3], [10, 13]),
    ([3, 2], [13, 12]),
]


def _ref_ibm1(sents, n_iter, include_null=True):
    support = set()
    for s, t_ in sents:
        ss = ([NULL_ID] + s) if include_null else s
        for e in ss:
            for f in t_:
                support.add((e, f))
    fan = defaultdict(set)
    for e, f in support:
        fan[e].add(f)
    t = {(e, f): 1.0 / len(fan[e]) for e, f in support}
    for _ in range(n_iter):
        cnt = defaultdict(float)
        tot = defaultdict(float)
        for s, t_ in sents:
            ss = ([NULL_ID] + s) if include_null else s
            for f in t_:
                z = sum(t[(e, f)] for e in ss)
                for e in ss:
                    c = t[(e, f)] / z
                    cnt[(e, f)] += c
                    tot[e] += c
        t = {ef: cnt[ef] / tot[ef[0]] for ef in cnt}
    return t


def test_ibm1_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(s, t) for s, t in SENTS], "src_tokens array<int>, tgt_tokens array<int>"
    )
    got = {(r["e"], r["f"]): r["t"] for r in train_ibm1(df, n_iter=4).collect()}
    want = _ref_ibm1(SENTS, n_iter=4)
    assert set(got) == set(want)
    for ef in want:
        assert math.isclose(got[ef], want[ef], rel_tol=1e-9), ef
    # rows of t sum to 1 per e
    sums = defaultdict(float)
    for (e, _f), v in got.items():
        sums[e] += v
    assert all(math.isclose(s, 1.0, rel_tol=1e-9) for s in sums.values())


def test_ibm1_concentrates_on_cooccurrence(spark):
    """The classic IBM-1 convergence property: 'la' co-occurs with 'the' in
    every sentence, so t('the'|'la') must dominate la's row after EM."""
    df = spark.createDataFrame(
        [(s, t) for s, t in SENTS], "src_tokens array<int>, tgt_tokens array<int>"
    )
    t = {(r["e"], r["f"]): r["t"] for r in train_ibm1(df, n_iter=5).collect()}
    la_row = {f: v for (e, f), v in t.items() if e == 0}
    assert max(la_row, key=la_row.get) == 10  # the
    maison_row = {f: v for (e, f), v in t.items() if e == 1}
    assert max(maison_row, key=maison_row.get) == 11  # house


def test_full_alignment_pipeline(spark):
    """train both directions -> viterbi -> swap bwd -> grow-diag-final:
    the complete fast_align-shape pipeline yields the diagonal links."""
    from marmot_spark.operators.alignment import symmetrize_alignments

    rows = [(f"s{i}", s, t) for i, (s, t) in enumerate(SENTS)]
    df = spark.createDataFrame(rows, "doc_id string, src_tokens array<int>, tgt_tokens array<int>")

    t_fwd = train_ibm1(df, "src_tokens", "tgt_tokens", n_iter=5)
    t_bwd = train_ibm1(
        df.select("doc_id", F.col("tgt_tokens").alias("src_tokens"),
                  F.col("src_tokens").alias("tgt_tokens")),
        "src_tokens", "tgt_tokens", n_iter=5,
    )
    fwd = viterbi_align(df, t_fwd, out_col="fwd")
    bwd_raw = viterbi_align(
        df.select("doc_id", F.col("tgt_tokens").alias("src_tokens"),
                  F.col("src_tokens").alias("tgt_tokens")),
        t_bwd, out_col="bl",
    )
    # bwd links are (s=tgt_pos, t=src_pos): swap into fwd orientation
    bwd = bwd_raw.select(
        "doc_id",
        F.transform(
            "bl", lambda p: F.struct(p["t"].alias("s"), p["s"].alias("t"))
        ).alias("bwd"),
    )
    both = (
        fwd.select("doc_id", "fwd", F.size("src_tokens").alias("n_src"),
                   F.size("tgt_tokens").alias("n_tgt"))
        .join(bwd, "doc_id")
    )
    out = {r["doc_id"]: [(p["s"], p["t"]) for p in r["align_sym"]]
           for r in symmetrize_alignments(both).collect()}
    # every sentence aligns diagonally (src k <-> tgt k by construction)
    for i, (s, _t) in enumerate(SENTS):
        assert out[f"s{i}"] == [(k, k) for k in range(len(s))], (i, out[f"s{i}"])
