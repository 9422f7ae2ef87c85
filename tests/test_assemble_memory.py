"""Constrained-memory proof of the chunked-assembly OOM bound.

``assemble_conversations`` holds one collect_list buffer per
conversation — a 2M-turn conversation is ~2M struct copies plus the
array_sort copy plus 2M per-turn formatted strings, all live at once.
``assemble_conversations_chunked`` never buffers more than
``chunk_size`` structs per group (stage 1) or one chunk string per
chunk (stage 2), so its peak is dominated by the final assembled
string itself.

Measured thresholds (this container, Spark 4.1.2, local[4], 2M-turn
single conversation, 4-char texts): chunked completes in a **500 MiB**
driver JVM; flat OOMs at 500m and 650m (deterministic across runs) and
needs ~800m. The test pins the separation point: same input, 650 MiB
heap → chunked completes, flat dies with java.lang.OutOfMemoryError.

~90 s of subprocess JVMs; skip with SPARK_GRAFT_SKIP_SLOW=1.
"""

import os
import subprocess
import sys

import pytest

PROBE = os.path.join(os.path.dirname(__file__), "memory_probe.py")
ARGS = ["--turns", "2000000", "--text-len", "4", "--driver-memory", "650m"]

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
    reason="slow subprocess probe skipped via SPARK_GRAFT_SKIP_SLOW",
)


def _run(mode: str) -> tuple[bool, str]:
    proc = subprocess.run(
        [sys.executable, PROBE, "--mode", mode, *ARGS],
        capture_output=True,
        text=True,
        timeout=300,
    )
    out = proc.stdout + proc.stderr
    return proc.returncode == 0 and "PROBE_OK" in proc.stdout, out


def test_chunked_survives_where_flat_ooms():
    ok_chunked, out_chunked = _run("chunked")
    assert ok_chunked, f"chunked assembly died in the 650m JVM:\n{out_chunked[-2000:]}"
    assert "n_turns=2000000" in out_chunked

    ok_flat, out_flat = _run("flat")
    assert not ok_flat, (
        "flat assembly survived the 650m JVM — the constrained-memory "
        "separation no longer holds; re-measure thresholds in memory_probe.py"
    )
    assert "OutOfMemoryError" in out_flat
