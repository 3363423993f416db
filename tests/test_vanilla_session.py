"""Every queries() entry must run under a DRIVER-IDENTICAL vanilla session.

Round 1's only driver-gate failure class (TIMESTAMP_NTZ analysis errors) was
invisible to the local suite because everything ran under ``build_session``,
which disables NTZ inference. This test executes the whole registry in a
SUBPROCESS with a bare ``SparkSession.builder.getOrCreate()`` — defaults only,
exactly the session shape the driver harness uses — so any query that only
works under the engine's own session configuration fails HERE first.

Runs --spark-only (execution, no DuckDB compare — oracle parity is covered by
driver_check at sf0.01 and the parity suite); sf0.001 keeps it fast.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_run_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "driver_check.py"),
         "/root/testdata/sf0.001", "--vanilla", "--spark-only"],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-45:])
    assert proc.returncode == 0, f"vanilla-session run failed:\n{tail}\n{proc.stderr[-2000:]}"
