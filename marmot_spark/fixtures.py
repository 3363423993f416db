"""Deterministic synthetic fixture tables (FIXTURES.md, seed=42).

numpy-only generation, written as parquet via pyarrow — no Spark needed to
generate, so tests and bench runs can materialize inputs cheaply and both
Spark and DuckDB read the exact same bytes.

Tables:
  sequences(doc_id string, seq_ts timestamp[us], tokens array<int32>,
            n_tok int32, source string)            -- hot-key skew built in
  labels(doc_id string, label_ts timestamp[us], label_seq int64,
         tag string, score double)                 -- adversarial leakage rows
  alignments(doc_id string, src_tokens array<int32>, align array<array<int32>>)
  ngram_dict(ngram array<int32>, n int32, count int64)

Reserved sentinel ids (never generated): START=-1, END=-2, UNALIGNED=-3.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = 50_000
BASE_TS_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00 UTC in micros

TS_TYPE = pa.timestamp("us")


def _doc_ids(n_rows: int, rng: np.random.Generator) -> np.ndarray:
    n_docs = max(4, n_rows // 8)
    ids = rng.integers(2, n_docs, size=n_rows)
    # hot-key skew: 30% of rows -> d00000000, 10% -> d00000001
    u = rng.random(n_rows)
    ids[u < 0.30] = 0
    ids[(u >= 0.30) & (u < 0.40)] = 1
    return ids


def gen_sequences(n_rows: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    doc_int = _doc_ids(n_rows, rng)

    # per-doc cumulative exponential gaps (mean 37s), stable within doc order
    order = np.argsort(doc_int, kind="stable")
    gaps = (rng.exponential(37.0, size=n_rows) * 1e6).astype(np.int64) + 1
    # ~0.5% duplicate timestamps within a doc: zero out some gaps
    gaps[rng.random(n_rows) < 0.005] = 0
    ts = np.empty(n_rows, dtype=np.int64)
    sorted_docs = doc_int[order]
    boundaries = np.flatnonzero(np.diff(sorted_docs)) + 1
    cum = np.cumsum(gaps[order])
    # restart the cumulative clock at each doc boundary
    starts = np.concatenate(([0], boundaries))
    offsets = np.zeros(n_rows, dtype=np.int64)
    base_at_start = np.concatenate(([np.int64(0)], cum[boundaries - 1]))
    for s, b in zip(starts, base_at_start):
        offsets[s] = b
    offsets = np.maximum.accumulate(offsets)
    ts_sorted = BASE_TS_US + (cum - offsets)
    ts[order] = ts_sorted

    # token lengths: Zipf-ish truncated [1, 512] + forced edge docs
    lengths = np.minimum(rng.zipf(1.3, size=n_rows), 512).astype(np.int32)
    for i, ln in enumerate([0, 1, 2, 511, 512]):
        if i < n_rows:
            lengths[i] = ln
    total = int(lengths.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(lengths))), type=pa.int32()),
        pa.array(flat, type=pa.int32()),
    )

    sources = np.array(["web", "news", "wiki", "chat"])
    src = sources[np.searchsorted([0.55, 0.80, 0.95, 1.0], rng.random(n_rows), side="right").clip(0, 3)]

    return pa.table(
        {
            "doc_id": pa.array([f"d{i:08d}" for i in doc_int], type=pa.string()),
            "seq_ts": pa.array(ts, type=TS_TYPE),
            "tokens": tokens,
            "n_tok": pa.array(lengths, type=pa.int32()),
            "source": pa.array(src, type=pa.string()),
        }
    )


def gen_labels(sequences: pa.Table, seed: int = SEED + 1) -> pa.Table:
    rng = np.random.default_rng(seed)
    doc = np.asarray(sequences.column("doc_id"))
    seq_ts = np.asarray(sequences.column("seq_ts").cast(pa.int64()))
    n_seq = len(doc)
    n_lab = max(4, int(n_seq * 0.7))

    pick = rng.integers(0, n_seq, size=n_lab)
    lab_doc = doc[pick].copy()
    # place labels before/at/after the picked row's ts
    jitter = (rng.normal(0.0, 60e6, size=n_lab)).astype(np.int64)
    lab_ts = seq_ts[pick] + jitter
    # adversarial rows: exact-equal ts and ts+1us on the first picks
    k = min(64, n_lab)
    lab_ts[:k:2] = seq_ts[pick[:k:2]]          # == seq_ts -> MUST join
    lab_ts[1:k:2] = seq_ts[pick[1:k:2]] + 1    # +1us -> must NOT join to that row
    # 10% orphan doc_ids (no match -> null backfill)
    orphan = rng.random(n_lab) < 0.10
    lab_doc[orphan] = np.array([f"x{i:08d}" for i in rng.integers(0, 10_000, size=int(orphan.sum()))])

    order = np.lexsort((lab_ts, lab_doc))
    lab_doc, lab_ts = lab_doc[order], lab_ts[order]
    label_seq = np.arange(n_lab, dtype=np.int64)
    tag = np.where(rng.random(n_lab) < 0.8, "OK", "BAD")
    score = rng.random(n_lab)

    return pa.table(
        {
            "doc_id": pa.array(lab_doc, type=pa.string()),
            "label_ts": pa.array(lab_ts, type=TS_TYPE),
            "label_seq": pa.array(label_seq, type=pa.int64()),
            "tag": pa.array(tag, type=pa.string()),
            "score": pa.array(score, type=pa.float64()),
        }
    )


def gen_alignments(sequences: pa.Table, seed: int = SEED + 2) -> pa.Table:
    rng = np.random.default_rng(seed)
    doc = sequences.column("doc_id").to_pylist()
    n_tok = np.asarray(sequences.column("n_tok"))
    seen: set[str] = set()
    rows_doc: list[str] = []
    src_offsets = [0]
    src_flat: list[np.ndarray] = []
    align_cells: list[list[list[int]]] = []
    for d, nt in zip(doc, n_tok):
        if d in seen:
            continue
        seen.add(d)
        rows_doc.append(d)
        src_len = max(1, int(round(nt * rng.uniform(0.8, 1.25)))) if nt > 0 else 1
        src_flat.append(rng.integers(0, VOCAB, size=src_len, dtype=np.int32))
        src_offsets.append(src_offsets[-1] + src_len)
        cell: list[list[int]] = []
        for p in range(int(nt)):
            u = rng.random()
            if u < 0.10:
                cell.append([])  # unaligned
            else:
                j = int(np.clip(p + rng.integers(-2, 3), 0, src_len - 1))
                if u < 0.20:
                    j2 = int(np.clip(j + 1, 0, src_len - 1))
                    cell.append([j, j2])  # multi-aligned, first wins
                else:
                    cell.append([j])
        align_cells.append(cell)
    src_tokens = pa.ListArray.from_arrays(
        pa.array(src_offsets, type=pa.int32()),
        pa.array(np.concatenate(src_flat) if src_flat else np.array([], dtype=np.int32), type=pa.int32()),
    )
    return pa.table(
        {
            "doc_id": pa.array(rows_doc, type=pa.string()),
            "src_tokens": src_tokens,
            "align": pa.array(align_cells, type=pa.list_(pa.list_(pa.int32()))),
        }
    )


def gen_ngram_dict(sequences: pa.Table, seed: int = SEED + 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    ngrams: list[list[int]] = [[t] for t in range(5000)]
    ns: list[int] = [1] * 5000
    toks = sequences.column("tokens").to_pylist()
    for row in toks[: min(len(toks), 2000)]:
        for n in (2, 3):
            for i in range(0, max(0, len(row) - n + 1), 7):
                if rng.random() < 0.4:
                    ngrams.append([int(x) for x in row[i : i + n]])
                    ns.append(n)
    counts = np.minimum(rng.zipf(1.5, size=len(ngrams)), 1_000_000).astype(np.int64)
    return pa.table(
        {
            "ngram": pa.array(ngrams, type=pa.list_(pa.int32())),
            "n": pa.array(ns, type=pa.int32()),
            "count": pa.array(counts, type=pa.int64()),
        }
    )


def write_fixture_dir(
    out_dir: str, n_rows: int, seed: int = SEED, row_group_size: int = 16384
) -> dict[str, str]:
    """Materialize all fixture tables under out_dir; returns name->path.

    row_group_size matters: a single giant row group makes the whole Spark
    scan (and every map stage fused with it) ONE task regardless of cores —
    parquet splits align to row groups. 16k-row groups give splittable scans
    like a real multi-file table would.
    """
    os.makedirs(out_dir, exist_ok=True)
    seqs = gen_sequences(n_rows, seed)
    tables = {
        "sequences": seqs,
        "labels": gen_labels(seqs),
        "alignments": gen_alignments(seqs),
        "ngram_dict": gen_ngram_dict(seqs),
    }
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p, row_group_size=row_group_size)
        paths[name] = p
    return paths
