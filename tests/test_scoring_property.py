"""Property-based differential tests for the round-4 statistics operators.

Random multisets/corpora — empty docs, all-ties value columns, singleton
vocabularies, degenerate splits — checked against direct python models. The
Spark side must agree EXACTLY (all outputs are integers by the operators'
quantization contract), for any random shape hypothesis generates.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from marmot_spark.operators.rank import quantile_buckets
from marmot_spark.operators.scoring import bigram_lm_loglik, tf_idf

# module-scoped handle set by the autouse fixture: @given may not take the
# pytest `spark` fixture directly (function-scoped fixtures vs hypothesis)
_SPARK = {}


import pytest


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    _SPARK["s"] = spark
    yield


VALS = st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=60)


@settings(max_examples=12, deadline=None)
@given(vals=VALS, k=st.integers(min_value=1, max_value=9))
def test_quantile_buckets_property(vals, k):
    spark = _SPARK["s"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r["doc_id"]: r["bucket"]
           for r in quantile_buckets(df, "v", k, keep=["doc_id"]).collect()}
    n = len(vals)
    cum = {v: sum(1 for w in vals if w < v) for v in set(vals)}
    assert got == {i: (cum[v] * k) // n for i, v in rows}
    # buckets are monotone in value and within range
    by_val = sorted((v, b) for (i, v), b in zip(rows, [got[i] for i, _ in rows]))
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(by_val, by_val[1:]))
    assert all(0 <= b < k for _, b in by_val)


DOCS = st.lists(
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=12),
    min_size=1, max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(docs=DOCS)
def test_tf_idf_property(docs):
    spark = _SPARK["s"]
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {(r["doc_id"], r["tok"]): (r["tf"], r["df"], r["tfidf_q"])
           for r in tf_idf(df).collect()}
    n = len(docs)
    dfc: dict = {}
    for toks in docs:
        for t in set(toks):
            dfc[t] = dfc.get(t, 0) + 1
    want = {}
    for i, toks in rows:
        for t in set(toks):
            tf = toks.count(t)
            want[(i, t)] = (tf, dfc[t], math.floor(tf * math.log(n / dfc[t]) * 1000.0 + 0.5))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(docs=DOCS, mod=st.integers(min_value=2, max_value=4))
def test_bigram_lm_property(docs, mod):
    from hypothesis import assume

    # an empty-train vocabulary (V = 0) makes the smoothed probability
    # undefined — out of the operator's contract, so constrain the generator
    assume(any(toks for i, toks in enumerate(docs) if i % mod != 0))
    spark = _SPARK["s"]
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    train = df.filter(F.col("doc_id") % mod != 0)
    score = df.filter(F.col("doc_id") % mod == 0)
    got = {r["doc_id"]: (r["n_bigrams"], r["ll_q"])
           for r in bigram_lm_loglik(train, score).collect()}

    tr = [toks for i, toks in rows if i % mod != 0]
    bi: dict = {}
    for toks in tr:
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    ctx: dict = {}
    for (a, _b), c in bi.items():
        ctx[a] = ctx.get(a, 0) + c
    vocab = len({t for toks in tr for t in toks})
    want = {}
    for i, toks in rows:
        if i % mod == 0 and len(toks) >= 2 and vocab > 0:
            terms = [
                math.floor(
                    math.log((bi.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + float(vocab)))
                    * 1e6 + 0.5)
                for a, b in zip(toks, toks[1:])
            ]
            want[i] = (len(terms), sum(terms))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(docs=DOCS)
def test_nb_logodds_property(docs):
    """Naive-Bayes log-odds vs a direct python model: exact integer equality
    (quantized per token before the sum), including the doc-count prior and
    the keep decision, labels = doc_id parity."""
    from hypothesis import assume

    from marmot_spark.operators.scoring import nb_logodds

    assume(any(toks for toks in docs))
    spark = _SPARK["s"]
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {r["doc_id"]: (r["nb_toks"], r["nb_logodds_q"], r["nb_keep"])
           for r in nb_logodds(df, F.col("doc_id") % 2 == 0).collect()}

    cp: dict = {}
    cn: dict = {}
    for i, toks in rows:
        tgt = cp if i % 2 == 0 else cn
        for t in toks:
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(cp) | set(cn)
    v = float(len(vocab))
    n_pos, n_neg = sum(cp.values()), sum(cn.values())
    w = {t: math.floor((math.log((cp.get(t, 0) + 1.0) / (n_pos + v))
                        - math.log((cn.get(t, 0) + 1.0) / (n_neg + v)))
                       * 1e6 + 0.5)
         for t in vocab}
    d_pos = sum(1 for i, _ in rows if i % 2 == 0)
    prior = math.floor(math.log((d_pos + 1.0) / (len(rows) - d_pos + 1.0)) * 1e6 + 0.5)
    want = {}
    for i, toks in rows:
        if toks:
            s = prior + sum(w[t] for t in toks)
            want[i] = (len(toks), s, s > 0)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(docs=DOCS, foreign=DOCS)
def test_nb_fit_score_foreign_corpus(docs, foreign):
    """nb_fit + nb_score on a FOREIGN corpus: out-of-vocabulary tokens take
    the model's smoothed OOV weight; exact integer parity with a direct
    python model. Scoring the training corpus itself reproduces nb_logodds
    exactly."""
    from hypothesis import assume

    from marmot_spark.operators.scoring import nb_fit, nb_logodds, nb_score

    assume(any(toks for toks in docs))
    spark = _SPARK["s"]
    rows = [(i, toks) for i, toks in enumerate(docs)]
    train = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    # shift half the foreign tokens out of the 0..9 training alphabet -> OOV
    frows = [(100 + i, [t + (100 if t % 2 else 0) for t in toks])
             for i, toks in enumerate(foreign)]
    fdf = spark.createDataFrame(frows, "doc_id long, tokens array<int>")

    weights, consts = nb_fit(train, F.col("doc_id") % 2 == 0)
    got = {r["doc_id"]: (r["nb_toks"], r["nb_logodds_q"], r["nb_keep"])
           for r in nb_score(fdf, weights, consts).collect()}

    cp: dict = {}
    cn: dict = {}
    for i, toks in rows:
        tgt = cp if i % 2 == 0 else cn
        for t in toks:
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(cp) | set(cn)
    v = float(len(vocab))
    n_pos, n_neg = sum(cp.values()), sum(cn.values())

    def w_of(cpt, cnt):
        return math.floor((math.log((cpt + 1.0) / (n_pos + v))
                           - math.log((cnt + 1.0) / (n_neg + v))) * 1e6 + 0.5)

    w = {t: w_of(cp.get(t, 0), cn.get(t, 0)) for t in vocab}
    oov = w_of(0, 0)
    d_pos = sum(1 for i, _ in rows if i % 2 == 0)
    prior = math.floor(math.log((d_pos + 1.0) / (len(rows) - d_pos + 1.0)) * 1e6 + 0.5)
    want = {}
    for i, toks in frows:
        if toks:
            s = prior + sum(w.get(t, oov) for t in toks)
            want[i] = (len(toks), s, s > 0)
    assert got == want

    # self-scoring identity with the one-pass operator
    self_scored = sorted(map(tuple, nb_score(train, weights, consts).collect()))
    one_pass = sorted(map(tuple, nb_logodds(train, F.col("doc_id") % 2 == 0).collect()))
    assert self_scored == one_pass


@settings(max_examples=8, deadline=None)
@given(docs=DOCS, min_count=st.integers(min_value=1, max_value=6))
def test_count_min_sketch_property(docs, min_count):
    """CMS vs a direct python model: bit-identical sketch counters and
    estimates (deterministic hashing), est >= true count for every token,
    and heavy_hitters returns EXACTLY the true >=min_count set with exact
    counts."""
    from marmot_spark.operators.sketch import (
        _CMS_ADDS, _CMS_MULTS, P31, cms_estimate, count_min_sketch, heavy_hitters,
    )

    d, w = 3, 16  # small w so collisions actually happen
    spark = _SPARK["s"]
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, tokens array<int>")

    def bucket(t, j):
        return ((t % P31 + P31) % P31 * _CMS_MULTS[j] + _CMS_ADDS[j]) % P31 % w

    flat = {}
    true = {}
    for toks in docs:
        for t in toks:
            true[t] = true.get(t, 0) + 1
            for j in range(d):
                k = (j, bucket(t, j))
                flat[k] = flat.get(k, 0) + 1

    sk = count_min_sketch(df, "tokens", d=d, w=w)
    got_sk = {(r["j"], r["b"]): r["cnt"] for r in sk.collect()}
    assert got_sk == flat

    est_of = {t: min(flat[(j, bucket(t, j))] for j in range(d)) for t in true}
    assert all(est_of[t] >= c for t, c in true.items())
    ex = df.select(F.explode("tokens").alias("tok")).distinct()
    got_est = {r["tok"]: r["e"]
               for r in ex.select("tok", cms_estimate(sk, F.col("tok"), d, w).alias("e")).collect()}
    assert got_est == est_of

    hh = {r["tok"]: (r["cnt"], r["est"])
          for r in heavy_hitters(df, "tokens", min_count=min_count, d=d, w=w).collect()}
    assert hh == {t: (c, est_of[t]) for t, c in true.items() if c >= min_count}


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=-10**12, max_value=10**12),
                     min_size=1, max_size=400),
       p=st.integers(min_value=4, max_value=8))
def test_hll_property(vals, p):
    """HLL registers and quantized estimate vs a direct python model: exact
    integer equality for any int64 inputs (overflow-safe pmod domain), and
    the small-range linear-counting branch."""
    from marmot_spark.operators.sketch import (
        P31, _HLL_A1, _HLL_A1B, _HLL_A2, _HLL_A2B, _HLL_M1, _HLL_M1B,
        _HLL_M2, _HLL_M2B, _HLL_SHIFT, _hll_alpha, hll_estimate, hll_registers,
    )

    spark = _SPARK["s"]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    m = 1 << p
    regs = {r["b"]: r["r"] for r in hll_registers(df, F.col("v"), p=p).collect()}
    got = hll_estimate(hll_registers(df, F.col("v"), p=p), p=p).collect()[0]["hll_est"]

    def mix(t, ma, aa, mb, ab):
        u = (t * ma + aa) % P31
        return ((u ^ (u >> _HLL_SHIFT)) * mb + ab) % P31

    want_regs: dict = {}
    for v in vals:
        t = v % P31  # python % is non-negative for positive modulus == pmod
        h1 = mix(t, _HLL_M1, _HLL_A1, _HLL_M1B, _HLL_A1B)
        h2 = mix(t, _HLL_M2, _HLL_A2, _HLL_M2B, _HLL_A2B)
        r = 32 if h2 == 0 else 31 - math.floor(math.log(float(h2)) / math.log(2.0))
        b = h1 % m
        want_regs[b] = max(want_regs.get(b, 0), r)
    assert regs == want_regs

    np_ = len(want_regs)
    sp = sum(1 << (32 - r) for r in want_regs.values())
    s = (m - np_) * 4294967296 + sp
    raw = _hll_alpha(m) * float(m) * float(m) * 4294967296.0 / float(s)
    zeros = m - np_
    est = float(m) * math.log(float(m) / float(zeros)) if (zeros > 0 and raw <= 2.5 * m) else raw
    assert got == math.floor(est + 0.5)


@settings(max_examples=8, deadline=None)
@given(docs=DOCS, mod=st.integers(min_value=2, max_value=4))
def test_bigram_lm_kn_property(docs, mod):
    """Interpolated Kneser-Ney bigram LM vs a direct python model: exact
    integer equality of the quantized per-doc log-likelihoods, including
    unseen pairs/contexts/unigrams (the backoff and +1/+V continuation
    patch) — the same float-op order as the operator."""
    from hypothesis import assume

    from marmot_spark.operators.scoring import bigram_lm_kn

    assume(any(toks for i, toks in enumerate(docs) if i % mod != 0))
    spark = _SPARK["s"]
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    train = df.filter(F.col("doc_id") % mod != 0)
    score = df.filter(F.col("doc_id") % mod == 0)
    got = {r["doc_id"]: (r["n_bigrams"], r["kn_ll_q"])
           for r in bigram_lm_kn(train, score).collect()}

    tr = [toks for i, toks in rows if i % mod != 0]
    bi: dict = {}
    for toks in tr:
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    ca: dict = {}
    n1a: dict = {}
    n1b: dict = {}
    for (a, b), c in bi.items():
        ca[a] = ca.get(a, 0) + c
        n1a[a] = n1a.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    t = len(bi)
    vocab = len({x for toks in tr for x in toks})
    D = 0.75
    want = {}
    for i, toks in rows:
        if i % mod == 0 and len(toks) >= 2:
            terms = []
            for a, b in zip(toks, toks[1:]):
                pcont = (float(n1b.get(b, 0)) + 1.0) / (float(t) + float(vocab))
                if ca.get(a, 0) > 0:
                    p = (max(float(bi.get((a, b), 0)) - D, 0.0) / float(ca[a])
                         + D * float(n1a.get(a, 0)) / float(ca[a]) * pcont)
                else:
                    p = pcont
                terms.append(math.floor(math.log(p) * 1e6 + 0.5))
            want[i] = (len(terms), sum(terms))
    assert got == want
