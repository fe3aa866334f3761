"""Crash-restart (auto-resume) and multi-host init gating tests."""

import json
import os

import numpy as np

from pacednegatives_tpu.train.loop import latest_checkpoint
from pacednegatives_tpu.train.runner import RunConfig, run


TINY = dict(
    model="tiny", bf16=False, remat=False, vocab_size=512,
    synthetic_docs=32, synthetic_queries=8, synthetic_pairs=32,
    synthetic_pool=8, max_q_tokens=6, max_d_tokens=16,
    warmup_steps=4, batch_size=4, chunk_size=2,
)


def test_latest_checkpoint_selection(tmp_path):
    assert latest_checkpoint(str(tmp_path / "missing")) is None
    d = tmp_path / "run"
    d.mkdir()
    assert latest_checkpoint(str(d)) is None
    (d / "step_4").mkdir()
    (d / "step_12").mkdir()
    (d / "final").mkdir()
    assert latest_checkpoint(str(d)).endswith("step_12")


def test_auto_resume_continues_run(tmp_path):
    out = str(tmp_path / "r")
    cfg = RunConfig(
        curriculum="interp", out_dir=out, total_steps=16,
        checkpoint_every_steps=2, **TINY,
    )
    run(cfg)  # 4 steps, checkpoints at 2 and 4

    # restart with more steps and auto-resume: continues from step 4
    cfg2 = RunConfig(
        curriculum="interp", out_dir=out, total_steps=32,
        checkpoint_every_steps=2, resume_from="auto", **TINY,
    )
    summary = run(cfg2)
    assert summary["steps"] == 8
    with open(os.path.join(out, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    steps_logged = [l["step"] for l in lines if "loss" in l]
    # resumed segment starts past the first run's cursor
    assert min(s for s in steps_logged if s > 4) > 4


def test_maybe_initialize_distributed_noop_single_host(monkeypatch):
    from pacednegatives_tpu.parallel.distributed import maybe_initialize_distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert maybe_initialize_distributed() is False
