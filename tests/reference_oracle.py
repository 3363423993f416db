"""Pure-pandas/numpy reference implementation of the marmot feature-extractor
semantics (SURVEY.md §5.2 M0).

The reference checkout was absent at survey time (SURVEY.md §0); these
functions pin the recalled public semantics as executable truth:

* context windows pad with '_START_' / '_END_' sentinels
  (marmot/util/ngram_window_extractor.py :: left_context/right_context/
  extract_window [R]) — on int token ids: START=-1, END=-2.
* alignment features take the FIRST aligned index; unaligned tokens get the
  '__unaligned__' sentinel (marmot/features/alignment_feature_extractor.py
  [R]) — on ids: UNALIGNED=-3.
* longest-ngram-order = max n with the n-gram ending at the token in the LM
  set (marmot/features/lm_feature_extractor.py [R]).
* binarization uses a deterministic SORTED vocabulary
  (marmot/experiment/preprocessing_utils.py [R] + engine determinism rule).
* label backfill = latest label with label_ts <= seq_ts (the north rule's
  temporal recast of span-tag expansion), tie-break by largest label_seq.

These are deliberately simple, row-at-a-time implementations — slow and
obviously correct — used only as the allclose oracle for the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

START_ID = -1
END_ID = -2
UNALIGNED_ID = -3


def context_window(tokens: list[int], index: int, k: int) -> dict[str, int]:
    """lag_1..lag_k / lead_1..lead_k with START/END padding."""
    out = {}
    n = len(tokens)
    for i in range(1, k + 1):
        out[f"lag_{i}"] = tokens[index - i] if index - i >= 0 else START_ID
        out[f"lead_{i}"] = tokens[index + i] if index + i < n else END_ID
    return out


def aligned_token(src_tokens: list[int] | None, align: list[list[int]], index: int) -> int:
    """First-aligned source token; UNALIGNED if no link or no source."""
    if src_tokens is None:
        return UNALIGNED_ID
    links = align[index] if index < len(align) else []
    if not links:
        return UNALIGNED_ID
    j = links[0]
    if 0 <= j < len(src_tokens):
        return src_tokens[j]
    return UNALIGNED_ID


def longest_ngram_order(tokens: list[int], index: int, lm: set[tuple[int, ...]], max_n: int = 3) -> int:
    best = 0
    for n in range(1, max_n + 1):
        if index - n + 1 < 0:
            break
        g = tuple(tokens[index - n + 1 : index + 1])
        if g in lm:
            best = n
    return best


def fit_sorted_vocab(values) -> dict[str, int]:
    return {v: i for i, v in enumerate(sorted({v for v in values if v is not None}))}


def binarize_value(value, vocab: dict) -> np.ndarray:
    vec = np.zeros(len(vocab), dtype=np.float64)
    idx = vocab.get(value)
    if idx is not None:
        vec[idx] = 1.0
    return vec


def asof_backfill(seqs: pd.DataFrame, labels: pd.DataFrame, payload: list[str]) -> pd.DataFrame:
    """Row-at-a-time as-of: latest label_ts <= seq_ts per doc, max label_seq on ties."""
    out_rows = []
    lab_by_doc = {k: g.sort_values(["label_ts", "label_seq"]) for k, g in labels.groupby("doc_id")}
    for _, row in seqs.iterrows():
        g = lab_by_doc.get(row["doc_id"])
        rec = {c: row[c] for c in seqs.columns}
        match = None
        if g is not None:
            eligible = g[g["label_ts"] <= row["seq_ts"]]
            if len(eligible):
                match = eligible.iloc[-1]
        for c in payload:
            rec[c] = match[c] if match is not None else None
        rec["matched_ts"] = match["label_ts"] if match is not None else None
        out_rows.append(rec)
    return pd.DataFrame(out_rows)


def sessionize(df: pd.DataFrame, entity: str, ts: str, gap_seconds: float, order_extra: list[str]) -> pd.Series:
    """1-based gap-session ids, same ordering contract as the engine."""
    df = df.sort_values([entity, ts] + order_extra, kind="stable")
    sess = np.empty(len(df), dtype=np.int64)
    last_ent, last_ts, cur = None, None, 0
    for i, (_, row) in enumerate(df.iterrows()):
        if row[entity] != last_ent:
            cur = 1
        elif (row[ts] - last_ts).total_seconds() > gap_seconds:
            cur += 1
        sess[i] = cur
        last_ent, last_ts = row[entity], row[ts]
    return pd.Series(sess, index=df.index)
