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


def _ref_ibm2(sents, n_iter, lam, p0=0.08, include_null=True):
    """Reference EM with the fast_align diagonal prior (fixed lambda):
    delta propto w(i,j,n,m) * t(f|e); w(NULL)=p0, w(i,j)= (1-p0)*
    exp(-lam*|i/n - j/m|) with i,j 1-based over the real lengths."""
    def w(i, n, j, m):  # i = 0 means NULL
        if i == 0:
            return p0
        return (1.0 - p0) * math.exp(-lam * abs(i / n - (j + 1) / m))

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
            n = len(s)
            m = len(t_)
            for j, f in enumerate(t_):
                z = sum(w(i, n, j, m) * t[(e, f)] for i, e in enumerate(ss))
                for i, e in enumerate(ss):
                    c = w(i, n, j, m) * t[(e, f)] / z
                    cnt[(e, f)] += c
                    tot[e] += c
        t = {ef: cnt[ef] / tot[ef[0]] for ef in cnt}
    return t


def test_ibm2_diagonal_matches_python_reference(spark):
    """train_ibm1(diagonal_lambda=2.0) — the fast_align reparameterized-IBM-2
    E step — matches the pure-python reference EM to 1e-9."""
    df = spark.createDataFrame(
        [(s, t) for s, t in SENTS], "src_tokens array<int>, tgt_tokens array<int>"
    )
    got = {(r["e"], r["f"]): r["t"]
           for r in train_ibm1(df, n_iter=4, diagonal_lambda=2.0).collect()}
    want = _ref_ibm2(SENTS, n_iter=4, lam=2.0)
    assert set(got) == set(want)
    for ef in want:
        assert math.isclose(got[ef], want[ef], rel_tol=1e-9), ef
    sums = defaultdict(float)
    for (e, _f), v in got.items():
        sums[e] += v
    assert all(math.isclose(s, 1.0, rel_tol=1e-9) for s in sums.values())


def test_ibm2_diagonal_disambiguates_repeated_tokens(spark):
    """The case IBM-1 cannot solve and the diagonal prior exists for: a
    source token occurring TWICE in a sentence. IBM-1's t-table is position-
    blind, so both target words tie and Viterbi's deterministic tie-break
    links both to the FIRST occurrence; with diagonal_lambda the nearer
    (diagonal) occurrence wins — per-position links, as fast_align gives."""
    rep = [([5, 5], [20, 21])] * 3 + [([5], [20]), ([5], [21])]
    df = spark.createDataFrame(
        [(f"s{i}", s, t) for i, (s, t) in enumerate(rep)],
        "doc_id string, src_tokens array<int>, tgt_tokens array<int>",
    )
    # include_null=False isolates the positional question (with NULL on, the
    # NULL word merely joins the tie — a separate effect)
    flat_t = train_ibm1(df, n_iter=3, include_null=False)
    flat = (
        viterbi_align(df, flat_t, include_null=False)
        .filter(F.col("doc_id") == "s0").collect()[0]
    )
    assert [(p["s"], p["t"]) for p in flat["links"]] == [(0, 0), (0, 1)]

    diag_t = train_ibm1(df, n_iter=3, include_null=False, diagonal_lambda=4.0)
    diag = (
        viterbi_align(df, diag_t, include_null=False, diagonal_lambda=4.0)
        .filter(F.col("doc_id") == "s0").collect()[0]
    )
    assert [(p["s"], p["t"]) for p in diag["links"]] == [(0, 0), (1, 1)]


def _ref_fast_align(sents, n_iter, lam0=4.0, p0=0.08, include_null=True):
    """Reference fast_align EM: the _ref_ibm2 E/M steps plus the tension
    M step — lambda set each round to the root of E_model(lambda)[h] ==
    posterior-weighted mean h, found by the same 60-step bisection as
    marmot_spark.operators.ibm1._solve_lambda (mirrored independently here
    with per-sentence loops instead of shape-grouped numpy)."""
    import numpy as np

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
    lam = lam0

    def w(i, n, j, m):  # i = 0 means NULL (include_null case)
        if include_null and i == 0:
            return p0
        scale = (1.0 - p0) if include_null else 1.0
        ii = i if include_null else i + 1
        return scale * math.exp(-lam * abs(ii / n - (j + 1) / m))

    for _ in range(n_iter):
        cnt = defaultdict(float)
        tot = defaultdict(float)
        # tension sufficient statistics: per (n, m, j) real-link posterior
        # mass and posterior-weighted h
        wgt = defaultdict(float)
        target = 0.0
        for s, t_ in sents:
            ss = ([NULL_ID] + s) if include_null else s
            n, m = len(s), len(t_)
            for j, f in enumerate(t_):
                z = sum(w(i, n, j, m) * t[(e, f)] for i, e in enumerate(ss))
                for i, e in enumerate(ss):
                    c = w(i, n, j, m) * t[(e, f)] / z
                    cnt[(e, f)] += c
                    tot[e] += c
                    real_i = i if include_null else i + 1
                    if not (include_null and i == 0):
                        h = abs(real_i / n - (j + 1) / m)
                        wgt[(n, m, j)] += c
                        target += c * h
        t = {ef: cnt[ef] / tot[ef[0]] for ef in cnt}

        def model_exp(l_):
            out = 0.0
            for (n, m, j), g in wgt.items():
                hv = np.abs(np.arange(1, n + 1) / n - (j + 1) / m)
                e_ = np.exp(-l_ * hv)
                out += g * float((e_ * hv).sum() / e_.sum())
            return out

        lo, hi = 1e-3, 64.0
        if model_exp(lo) <= target:
            lam = lo
        elif model_exp(hi) >= target:
            lam = hi
        else:
            for _ in range(60):
                mid = (lo + hi) / 2.0
                if model_exp(mid) > target:
                    lo = mid
                else:
                    hi = mid
            lam = (lo + hi) / 2.0
    return t, lam


# diagonal corpus: tgt is src shifted into the 100+ id range, same positions
DIAG_SENTS = [
    ([0, 1, 2, 3], [100, 101, 102, 103]),
    ([1, 3, 0, 2], [101, 103, 100, 102]),
    ([2, 0, 3], [102, 100, 103]),
    ([3, 2, 1, 0], [103, 102, 101, 100]),
    ([0, 2, 1], [100, 102, 101]),
]


def test_fast_align_matches_python_reference(spark):
    """train_fast_align == the pure-python mirror: same learned tension
    (the bisection root over identical sufficient statistics) and same
    t-table, to float tolerance, over multiple EM rounds — the compounding
    path (lambda_k feeds E-step k+1) stays in lockstep."""
    df = spark.createDataFrame(
        [(s, t) for s, t in DIAG_SENTS], "src_tokens array<int>, tgt_tokens array<int>"
    )
    from marmot_spark.operators.ibm1 import train_fast_align

    t_df, lam = train_fast_align(df, n_iter=3, lambda_init=2.0)
    want_t, want_lam = _ref_fast_align(DIAG_SENTS, n_iter=3, lam0=2.0)
    assert math.isclose(lam, want_lam, rel_tol=1e-6, abs_tol=1e-6), (lam, want_lam)
    got = {(r["e"], r["f"]): r["t"] for r in t_df.collect()}
    assert set(got) == set(want_t)
    for ef in want_t:
        assert math.isclose(got[ef], want_t[ef], rel_tol=1e-7, abs_tol=1e-9), ef


def test_fast_align_learns_corpus_tension(spark):
    """The tension is a property of the DATA: a strictly position-preserving
    corpus drives lambda up (sharper diagonal) while the same sentence pairs
    with target order reversed drive it down — and the learned (t, lambda)
    Viterbi-recovers the true diagonal links."""
    from marmot_spark.operators.ibm1 import train_fast_align

    diag = spark.createDataFrame(
        [(f"d{i}", s, t) for i, (s, t) in enumerate(DIAG_SENTS)],
        "doc_id string, src_tokens array<int>, tgt_tokens array<int>",
    )
    rev = spark.createDataFrame(
        [(f"r{i}", s, t[::-1]) for i, (s, t) in enumerate(DIAG_SENTS)],
        "doc_id string, src_tokens array<int>, tgt_tokens array<int>",
    )
    t_d, lam_d = train_fast_align(diag, n_iter=3, id_col="doc_id")
    _, lam_r = train_fast_align(rev, n_iter=3, id_col="doc_id")
    assert lam_d > lam_r, (lam_d, lam_r)
    out = viterbi_align(diag, t_d, id_col="doc_id", diagonal_lambda=lam_d).collect()
    for row in out:
        src, links = row["src_tokens"], row["links"]
        assert len(links) == len(src)
        for l_ in links:
            assert l_["s"] == l_["t"]  # position-preserving corpus


def test_fast_align_shape_cap_raises(spark):
    from marmot_spark.operators.ibm1 import train_fast_align
    import pytest

    df = spark.createDataFrame(
        [(s, t) for s, t in DIAG_SENTS], "src_tokens array<int>, tgt_tokens array<int>"
    )
    with pytest.raises(ValueError, match="sentence shapes"):
        train_fast_align(df, n_iter=1, max_shape_rows=2)


def test_full_fast_align_pipeline_learned_tension(spark):
    """The complete fast_align pipeline with LEARNED tensions, both
    directions independently: train_fast_align fwd + bwd -> viterbi with
    each direction's own learned lambda -> swap bwd -> grow-diag-final.
    On a repeated-token corpus (where plain IBM-1 is position-blind) the
    learned-tension pipeline recovers the exact diagonal."""
    from marmot_spark.operators.alignment import symmetrize_alignments
    from marmot_spark.operators.ibm1 import train_fast_align

    # every sentence repeats tokens, so only the diagonal prior can pick
    # the positionally-correct occurrence
    sents = [
        ([0, 1, 0, 2], [100, 101, 100, 102]),
        ([2, 2, 1], [102, 102, 101]),
        ([1, 0, 1, 3], [101, 100, 101, 103]),
        ([3, 0, 3], [103, 100, 103]),
        ([0, 2, 0], [100, 102, 100]),
    ]
    rows = [(f"s{i}", s, t) for i, (s, t) in enumerate(sents)]
    df = spark.createDataFrame(rows, "doc_id string, src_tokens array<int>, tgt_tokens array<int>")
    rev = df.select("doc_id", F.col("tgt_tokens").alias("src_tokens"),
                    F.col("src_tokens").alias("tgt_tokens"))

    t_fwd, lam_fwd = train_fast_align(df, n_iter=4, id_col="doc_id")
    t_bwd, lam_bwd = train_fast_align(rev, n_iter=4, id_col="doc_id")
    assert lam_fwd > 1.0 and lam_bwd > 1.0, (lam_fwd, lam_bwd)

    fwd = viterbi_align(df, t_fwd, out_col="fwd", diagonal_lambda=lam_fwd)
    bwd_raw = viterbi_align(rev, t_bwd, out_col="bl", diagonal_lambda=lam_bwd)
    bwd = bwd_raw.select(
        "doc_id",
        F.transform("bl", lambda p: F.struct(p["t"].alias("s"), p["s"].alias("t"))).alias("bwd"),
    )
    both = (
        fwd.select("doc_id", "fwd", F.size("src_tokens").alias("n_src"),
                   F.size("tgt_tokens").alias("n_tgt"))
        .join(bwd, "doc_id")
    )
    out = {r["doc_id"]: [(p["s"], p["t"]) for p in r["align_sym"]]
           for r in symmetrize_alignments(both).collect()}
    for i, (s, _t) in enumerate(sents):
        assert out[f"s{i}"] == [(k, k) for k in range(len(s))], (i, out[f"s{i}"])
