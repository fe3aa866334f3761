"""bench.py output contract: the last stdout line is parseable JSON under
EVERY failure mode (the property whose absence emptied the round-2/3
driver records — VERDICT r3 item 1).

Runs the real parent orchestration as a subprocess with a deliberately
impossible fused-phase timeout: the run must fail (rc != 0) yet still
print (a) a stub record as its FIRST line and (b) a final record carrying
an ``error`` field — both valid JSON with the headline metric keys.
"""

import json
import os
import subprocess
import sys


def test_fatal_fused_phase_still_emits_parseable_record():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        BENCH_FORCE_CPU="1",
        BENCH_MODEL="tiny",
        BENCH_STEPS="2",
        BENCH_FUSED_TIMEOUT="2",   # kills the fused subprocess mid-import
        BENCH_TIME_BUDGET="20",    # too little budget for a retry
        BENCH_SCALE="0",
        BENCH_LONG="0",
        BENCH_RERANK="0",
        BENCH_SCORED="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode != 0  # fatal phase -> nonzero, but still...
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout at all; stderr: {proc.stderr[-500:]}"
    records = [json.loads(ln) for ln in lines]  # every line must parse
    first, last = records[0], records[-1]
    for rec in (first, last):
        assert rec["metric"] == "negatives_scored_per_sec_per_chip"
        assert rec["unit"] == "neg/s/chip"
        assert "value" in rec
    assert "startup" in first["error"]
    assert "fused" in last["error"]
