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


def _isolated_arbitration_env(tmp_path):
    """Every test that runs the PARENT bench must sandbox the chip-
    arbitration files: the parent takes the driver lock and PREEMPTS
    (group-kills) whatever pid the queue-active file advertises. Round 5
    measured this the hard way — a test-suite run on a box with a live
    TPU queue killed the queue's in-flight full-bench runs (warm_full_1/2
    rc=143) and left a stale real /tmp lock behind."""
    return dict(
        BENCH_DRIVER_LOCK=str(tmp_path / "driver.lock"),
        BENCH_QUEUE_ACTIVE=str(tmp_path / "queue_active.pid"),
    )


def test_fatal_fused_phase_still_emits_parseable_record(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        **_isolated_arbitration_env(tmp_path),
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


def test_driver_lock_preempts_queue_and_cleans_up(tmp_path):
    """Chip arbitration (bench.py:_take_driver_lock): the parent bench must
    kill the pid advertised in the queue-active file (a queue experiment
    holding the chip), and must remove its own driver lock at exit so the
    queues can resume. Paths are env-parametrized so this test can never
    touch a live queue's files."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lock = tmp_path / "driver.lock"
    active = tmp_path / "queue_active.pid"
    sleeper = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(300)"])
    try:
        active.write_text(str(sleeper.pid))
        env = dict(
            os.environ,
            BENCH_FORCE_CPU="1",
            BENCH_DRIVER_LOCK=str(lock),
            BENCH_QUEUE_ACTIVE=str(active),
        )
        proc = subprocess.run(
            [sys.executable, "-c",
             "import bench; bench._take_driver_lock()"],
            env=env, cwd=root, capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-500:]
        assert "preempting queue experiment" in proc.stderr
        assert sleeper.wait(timeout=30) != 0  # SIGTERMed by the lock taker
        assert not lock.exists()  # atexit released the lock
    finally:
        if sleeper.poll() is None:
            sleeper.kill()


def test_queue_phase_advertises_own_pid(tmp_path):
    """A BENCH_QUEUE=1 phase process must write its pid to the queue-active
    file while running (so the driver can preempt exactly it) and remove it
    at exit."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    active = tmp_path / "queue_active.pid"
    env = dict(
        os.environ,
        BENCH_FORCE_CPU="1",
        BENCH_QUEUE="1",
        BENCH_QUEUE_ACTIVE=str(active),
        BENCH_QUEUE_ACTIVE_HOLD="3",  # test hook: hold after write
        BENCH_PHASE="noop",           # marker write + exit, no model build
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    import time as _time
    deadline = _time.monotonic() + 60
    while _time.monotonic() < deadline and not active.exists():
        _time.sleep(0.1)
    assert active.exists(), proc.stderr.read()[-500:] \
        if proc.poll() is not None else "pid file never appeared"
    assert int(active.read_text()) == proc.pid
    proc.wait(timeout=60)
    assert not active.exists()  # cleaned up at exit


def test_fast_mode_emits_complete_headline_record_rc0(tmp_path):
    """BENCH_FAST=1 (the r5 queue's first action when the tunnel returns)
    must produce a complete official-format record — value, vs_baseline,
    north_star — from just the two required phases, rc=0, with no optional
    phase run OR listed as skipped (disabled != budget-skipped)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        **_isolated_arbitration_env(tmp_path),
        BENCH_FORCE_CPU="1",
        BENCH_FAST="1",
        BENCH_MODEL="tiny",
        BENCH_STEPS="2",
        BENCH_BATCH="2",
        BENCH_NEGS="2",
        BENCH_MICROBATCH="1",
        BENCH_TIME_BUDGET="400",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    last = json.loads([ln for ln in proc.stdout.splitlines() if ln.strip()][-1])
    assert last["value"] > 0
    assert last["vs_baseline"] > 0
    assert "north_star" in last
    assert "skipped_phases" not in last
    assert set(last["phase_secs"]) == {"fused", "ref"}


def test_stale_driver_lock_recovered_by_second_official_run(tmp_path):
    """VERDICT r4 weak #7: a driver bench that CRASHES holding the lock
    (pid in the lock file is dead) must not block the next official run —
    _take_driver_lock overwrites the stale lock, doesn't try to preempt a
    stale queue-active pid, and still releases the lock at exit."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lock = tmp_path / "driver.lock"
    active = tmp_path / "queue_active.pid"
    # a real-but-dead pid for both files (the crashed driver / a queue
    # experiment that died with it)
    corpse = subprocess.Popen([sys.executable, "-c", "pass"])
    corpse.wait(timeout=30)
    lock.write_text(str(corpse.pid))
    active.write_text(str(corpse.pid))
    env = dict(
        os.environ,
        BENCH_FORCE_CPU="1",
        BENCH_DRIVER_LOCK=str(lock),
        BENCH_QUEUE_ACTIVE=str(active),
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import bench, os; bench._take_driver_lock(); "
         # while alive, the lock must carry OUR pid (stale pid replaced)
         "assert open(bench._DRIVER_LOCK).read().strip() == str(os.getpid())"],
        env=env, cwd=root, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    # dead advertised pid => nothing to preempt, no kill attempt logged
    assert "preempting" not in proc.stderr
    assert not lock.exists()  # atexit released the recovered lock


def test_queue_wait_driver_clears_stale_lock(tmp_path):
    """The queue side of the same crash: the REAL wait_driver function from
    scripts/tpu_experiment_queue_r5.sh (extracted verbatim, lock path
    substituted so a live queue's files are never touched) must remove a
    stale lock and return instead of waiting forever."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(root, "scripts",
                            "tpu_experiment_queue_r5.sh")).read()
    fn = re.search(r"wait_driver\(\) \{.*?\n\}", src, re.S).group(0)
    lock = tmp_path / "driver.lock"
    fn = fn.replace("/tmp/pn_bench_driver.lock", str(lock))
    corpse = subprocess.Popen([sys.executable, "-c", "pass"])
    corpse.wait(timeout=30)
    lock.write_text(str(corpse.pid))
    # must terminate well inside the timeout (a deadlock would hang 30s+)
    proc = subprocess.run(["bash", "-c", fn + "\nwait_driver"],
                          capture_output=True, text=True, timeout=25)
    assert proc.returncode == 0, proc.stderr[-300:]
    assert not lock.exists()  # stale lock cleared so experiments resume


def test_budget_skipped_optional_phases_recorded_rc0(tmp_path):
    """A healthy fused+ref run whose budget runs out before the optional
    phases must exit 0 with the headline keys AND list every skipped
    optional phase in ``skipped_phases`` — a budget-skipped trailing phase
    must be distinguishable from a disabled one."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        **_isolated_arbitration_env(tmp_path),
        BENCH_FORCE_CPU="1",
        BENCH_MODEL="tiny",
        BENCH_STEPS="2",
        BENCH_BATCH="2",
        BENCH_NEGS="2",
        BENCH_MICROBATCH="1",  # caller override: B=2 can't split 4 ways
        # enough for the two required phases on CPU-tiny, far below any
        # optional phase's cold estimate => all optionals budget-skip
        BENCH_TIME_BUDGET="170",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last["value"] > 0
    assert "fused_steps_per_sec" in last
    skipped = set(last.get("skipped_phases", []))
    assert {"fused512", "scale", "fused_scored", "rerank"} <= skipped
