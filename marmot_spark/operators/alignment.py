"""Alignment-derived features (SURVEY.md J1/W2).

Reference semantics: for target token i, marmot fetches the aligned source
token source[a(i)] and its ±k context; unaligned tokens get an
'__unaligned__' sentinel; multi-aligned tokens take the FIRST aligned index
(marmot/features/alignment_feature_extractor.py ::
AlignmentFeatureExtractor.get_features() [R — SURVEY.md §0]).

Spark-first design: alignments ride as an ``array<array<int>>`` column joined
once per doc (equi-join on doc_id — sort-merge for big sides, broadcast for
small), after which every per-token lookup is pure array arithmetic
(``F.get``) inside whole-stage codegen — no shuffle per token, no Python.
Sentinel on int32 ids: UNALIGNED=-3; aligned-context padding uses START/END.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marmot_spark import END_ID, START_ID, UNALIGNED_ID


def first_aligned_idx(align_col: str, pos_col: str) -> Column:
    """First aligned source index for the token at pos (null if unaligned)."""
    return F.get(F.get(F.col(align_col), F.col(pos_col)), 0)


def join_alignments(tokens_exploded: DataFrame, alignments: DataFrame, on: str = "doc_id") -> DataFrame:
    """Attach src_tokens / align arrays to the exploded token stream (one equi-join)."""
    return tokens_exploded.join(alignments, on, "left")


def with_aligned_token(df: DataFrame, k_context: int = 0) -> DataFrame:
    """Add aligned_tok (+ aligned context ±k) columns.

    Expects columns: pos, align (array<array<int>>), src_tokens (array<int>).
    aligned_tok = src_tokens[align[pos][0]] | UNALIGNED.
    aligned_lag_i / aligned_lead_i pad with START/END like W1.
    """
    # a missing source sentence (left-join miss) is "unaligned" for every token
    idx = F.when(F.col("src_tokens").isNotNull(), first_aligned_idx("align", "pos"))
    df = df.withColumn(
        "aligned_tok",
        F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
            F.coalesce(F.get(F.col("src_tokens"), idx), F.lit(UNALIGNED_ID))
        ),
    )
    for i in range(1, k_context + 1):
        df = df.withColumn(
            f"aligned_lag_{i}",
            F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
                F.coalesce(F.get(F.col("src_tokens"), idx - i), F.lit(START_ID))
            ),
        )
        df = df.withColumn(
            f"aligned_lead_{i}",
            F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
                F.coalesce(F.get(F.col("src_tokens"), idx + i), F.lit(END_ID))
            ),
        )
    return df


def with_pseudo_ref_membership(
    tokens_exploded: DataFrame,
    pseudo_refs: DataFrame,
    on: str = "doc_id",
    ref_tokens_col: str = "ref_tokens",
    out_col: str = "in_pseudo_ref",
) -> DataFrame:
    """J4 pseudo-reference membership: flag whether each target token occurs in
    the doc's pseudo-reference translation.

    Reference semantics: marmot scores each token against a pseudo-reference
    produced by another MT system (token-in-reference binary feature,
    marmot/features — pseudo-reference extractor family [R — SURVEY.md §0]).

    Spark-first shape: ONE equi-join per doc attaches the reference token
    array (sort-merge for large reference sets, broadcast when small — left
    to Catalyst/AQE stats), then per-token membership is ``array_contains``
    on the riding array inside whole-stage codegen — no per-token join, no
    shuffle beyond the single doc-level join. A doc with no pseudo-reference
    yields 0 (not-in-reference), matching the reference's treatment of
    missing system output.
    """
    joined = tokens_exploded.join(pseudo_refs, on, "left")
    return joined.withColumn(
        out_col,
        F.when(
            F.col(ref_tokens_col).isNotNull()
            & F.array_contains(F.col(ref_tokens_col), F.col("tok")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop(ref_tokens_col)


# ---------------------------------------------------------------------------
# alignment symmetrization (grow-diag-final[-and])
# ---------------------------------------------------------------------------

_NEIGHBORS = ((-1, 0), (0, -1), (1, 0), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1))


def grow_diag_final(
    fwd: list[tuple[int, int]],
    bwd: list[tuple[int, int]],
    n_src: int,
    n_tgt: int,
    final_and: bool = True,
) -> list[tuple[int, int]]:
    """Koehn's GROW-DIAG-FINAL(-AND) heuristic combining the two directional
    aligner outputs of one sentence pair into a single symmetrized link set
    (the standard Moses symmetrization every phrase/alignment pipeline runs
    after fast_align's forward+reverse passes; marmot consumes exactly such
    symmetrized alignments [R — SURVEY.md §0 util/alignments.py]).

    Links are (s, t) pairs. Start from the intersection, grow into
    union-neighbors (incl. diagonal) touching an unaligned word until
    fixpoint, then FINAL-adds forward links and backward links whose words
    are unaligned (``final_and=True`` requires BOTH ends unaligned — the
    precision-leaning 'and' variant; False = either, Moses 'final').
    Deterministic: the grid is scanned in (s, t) order every pass.
    """
    fset, bset = set(map(tuple, fwd)), set(map(tuple, bwd))
    aligned = set(fset & bset)
    union = fset | bset
    src_al = {s for s, _ in aligned}
    tgt_al = {t for _, t in aligned}
    grew = True
    while grew:
        grew = False
        for s in range(n_src):
            for t in range(n_tgt):
                if (s, t) not in aligned:
                    continue
                for ds, dt in _NEIGHBORS:
                    ns, nt = s + ds, t + dt
                    if not (0 <= ns < n_src and 0 <= nt < n_tgt):
                        continue
                    if (ns, nt) in union and (ns, nt) not in aligned and (
                        ns not in src_al or nt not in tgt_al
                    ):
                        aligned.add((ns, nt))
                        src_al.add(ns)
                        tgt_al.add(nt)
                        grew = True
    for links in (fset, bset):
        for s, t in sorted(links):
            if (s, t) in aligned:
                continue
            free_s, free_t = s not in src_al, t not in tgt_al
            if (free_s and free_t) if final_and else (free_s or free_t):
                aligned.add((s, t))
                src_al.add(s)
                tgt_al.add(t)
    return sorted(aligned)


def symmetrize_alignments(
    df: DataFrame,
    fwd_col: str = "fwd",
    bwd_col: str = "bwd",
    n_src_col: str = "n_src",
    n_tgt_col: str = "n_tgt",
    out_col: str = "align_sym",
    final_and: bool = True,
) -> DataFrame:
    """Symmetrize per-sentence directional alignments with
    grow-diag-final(-and). Link columns are ``array<struct<s:int,t:int>>``.

    Execution note (the brief's case (b)): the heuristic is an inherently
    sequential per-sentence fixpoint over a tiny link grid, which Column
    HOFs cannot express without bounding sentence length — so it runs as
    per-sentence python INSIDE Arrow batches via ``mapInPandas`` (narrow,
    zero shuffle, ~10^1-10^2 links per sentence; the same sanctioned
    exception class as the opaque media decoder in multimodal.py). All
    surrounding plumbing — schema, batching, column passthrough — is
    columnar.
    """
    import pandas as pd

    out_field = f"{out_col}: array<struct<s:int,t:int>>"
    schema = ", ".join(
        f"{f.name}: {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + out_field
    schema = schema.replace(": ", " ")

    def gen(batches):
        for pdf in batches:
            outs = []
            for fwd, bwd, ns, nt in zip(
                pdf[fwd_col], pdf[bwd_col], pdf[n_src_col], pdf[n_tgt_col]
            ):
                links = grow_diag_final(
                    [(p["s"], p["t"]) for p in fwd],
                    [(p["s"], p["t"]) for p in bwd],
                    int(ns), int(nt), final_and=final_and,
                )
                outs.append([{"s": s, "t": t} for s, t in links])
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(outs, index=pdf.index)
            yield pdf

    return df.mapInPandas(gen, schema=schema)
