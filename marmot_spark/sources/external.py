"""S5: external-tool integration (SURVEY.md §2.1).

Reference semantics: marmot shells out to external NLP binaries per corpus —
fast_align for word alignments (marmot/util/force_align.py [R — SURVEY.md
§0]), TreeTagger for POS tags (marmot/util/call_treetagger.py [R]) — feeding
them line-oriented text over stdin and reading line-oriented results from
stdout, one output line per input line.

Spark-first re-expression: the tool runs ONCE PER ARROW BATCH inside
``mapInPandas`` — the driver never sees the data, executors stream their own
partitions through a local subprocess, and the per-invocation process-spawn
cost is amortized over thousands of rows (vs marmot's per-corpus single
process, this also parallelizes across executors). Row alignment is
positional: the tool must emit exactly one output line per input line (the
fast_align/TreeTagger contract). Newlines inside values are rejected rather
than silently corrupting the alignment.

At 100 TB: this is the standard "sidecar binary" shape — the binary ships
via ``spark-submit --files``, each executor fork/execs it per batch (or keeps
a long-lived worker via ``pipe_per_partition=True`` which spawns once per
PARTITION and streams), and the operator stays a narrow map: no shuffle, no
driver involvement, no per-row Python.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def pipe_text(
    df: DataFrame,
    col: str,
    cmd: Sequence[str],
    out_col: str = "piped",
    per_partition: bool = False,
) -> DataFrame:
    """Run each value of ``col`` through an external line-oriented tool.

    ``cmd`` is argv for the subprocess (no shell). The tool must write one
    output line per input line. ``per_partition=True`` spawns one LONG-LIVED
    worker per partition and requires an INTERACTIVE tool that flushes per
    line (fast_align's force-align mode, TreeTagger's -quiet pipe mode);
    a block-buffering filter (plain ``tr``/``sed`` on a pipe) would deadlock
    waiting for output that only flushes at EOF — use the default per-batch
    mode for those (the tool sees EOF each batch, so stdio buffering is
    irrelevant and memory stays bounded at one Arrow batch).
    Rows with NULL text pass through as NULL without touching the tool.
    """
    cmd = list(cmd)
    in_cols = df.columns
    # fresh StructType — StructType.add mutates in place and df.schema is
    # cached on the DataFrame, so add() would corrupt the caller's frame
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    def run_tool(lines: list[str]) -> list[str]:
        proc = subprocess.run(
            cmd, input="\n".join(lines) + "\n" if lines else "",
            capture_output=True, text=True, check=True,
        )
        out = proc.stdout.split("\n")
        if out and out[-1] == "":
            out.pop()
        if len(out) != len(lines):
            raise RuntimeError(
                f"external tool {cmd[0]!r} emitted {len(out)} lines for "
                f"{len(lines)} inputs — the one-line-per-line contract is broken"
            )
        return out

    def feed(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            texts = pdf[col]
            mask = texts.notna()
            lines = texts[mask].astype(str).tolist()
            if any("\n" in ln for ln in lines):
                raise ValueError(f"column {col!r} contains embedded newlines")
            piped = run_tool(lines) if lines else []
            result = pd.Series([None] * len(pdf), dtype=object, index=pdf.index)
            result[mask] = piped
            pdf[out_col] = result
            yield pdf

    def feed_per_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one long-lived worker per partition; batches stream through it.
        # write/readline per batch keeps the pipe drained (the tool is
        # line-oriented, so per-batch flush cannot deadlock on full buffers
        # as long as batch output fits the pipe — we read eagerly per line).
        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1
        )
        try:
            for pdf in pdfs:
                texts = pdf[col]
                mask = texts.notna()
                lines = texts[mask].astype(str).tolist()
                if any("\n" in ln for ln in lines):
                    raise ValueError(f"column {col!r} contains embedded newlines")
                out = []
                for ln in lines:
                    proc.stdin.write(ln + "\n")
                    proc.stdin.flush()
                    resp = proc.stdout.readline()
                    if resp == "":
                        # EOF while stdin is still open = the worker died
                        # mid-partition. Without this check every remaining
                        # row silently became "" — corruption, not an error.
                        rc = proc.wait()
                        raise RuntimeError(
                            f"external tool {cmd[0]!r} exited (rc={rc}) "
                            f"mid-partition after {len(out)} of {len(lines)} "
                            "lines — the one-line-per-line contract is broken"
                        )
                    out.append(resp.rstrip("\n"))
                result = pd.Series([None] * len(pdf), dtype=object, index=pdf.index)
                result[mask] = out
                pdf[out_col] = result
                yield pdf
            # drain check: a tool emitting >1 line per input would leave
            # output buffered here and have misaligned every row after the
            # first extra line — fail loudly instead
            proc.stdin.close()
            trailing = proc.stdout.readline()
            if trailing != "":
                raise RuntimeError(
                    f"external tool {cmd[0]!r} emitted trailing output after all "
                    "inputs — more than one line per input line"
                )
            rc = proc.wait()
            if rc != 0:
                raise RuntimeError(f"external tool {cmd[0]!r} exited with rc={rc}")
        finally:
            try:
                proc.stdin.close()
            except (OSError, ValueError):
                pass
            proc.wait()

    fn = feed_per_partition if per_partition else feed
    return df.select(*in_cols).mapInPandas(fn, schema=out_schema)
