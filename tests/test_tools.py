"""Tests for data tools, contrast controller, profiling, grad accumulation,
and the online/contrast runner paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import ContrastController, StepSignals
from pacednegatives_tpu.data.tools import (
    clean_text,
    collapse_triples,
    collate_pools,
    get_balanced_idx,
    subsample,
    take_balanced_subset,
    take_subset,
)


def _sig(pce, nce, success):
    pce = jnp.asarray(pce, jnp.float32)
    nce = jnp.asarray(nce, jnp.float32)
    return StepSignals(pce=pce, nce=nce, ce=(pce + nce) / 2,
                       success=jnp.asarray(success, jnp.float32))


def test_clean_text():
    assert clean_text("Hello, world! 123?") == "Hello world 123"


def test_collapse_triples_groups_and_orders():
    triples = [
        {"query_id": "q1", "doc_id_a": "p", "doc_id_b": "a"},
        {"query_id": "q1", "doc_id_a": "p", "doc_id_b": "b"},
        {"query_id": "q1", "doc_id_a": "p", "doc_id_b": "c"},
        {"query_id": "q2", "doc_id_a": "p2", "doc_id_b": "x"},
    ]
    scores = {"a": 3.0, "b": 1.0, "c": 2.0, "x": 1.0}
    out = collapse_triples(triples, score_fn=lambda q, d: scores[d])
    by_q = {r["query_id"]: r for r in out}
    assert by_q["q1"]["doc_id_b"] == ["b", "c", "a"]  # easiest first
    assert by_q["q2"]["doc_id_b"] == ["x"]


def test_subset_tools():
    recs = [{"query_id": "q", "doc_id_a": "p", "doc_id_b": list("abcdefgh")}]
    assert take_subset(recs, 3)[0]["doc_id_b"] == ["a", "b", "c"]
    bal = take_balanced_subset(recs, 3)[0]["doc_id_b"]
    assert bal[0] == "a" and bal[-1] == "h" and len(bal) == 3
    assert get_balanced_idx(["x", "y"], 5) == ["x", "x", "x", "y", "y"]


def test_collate_and_subsample():
    pairs = [{"query_id": "q1", "doc_id_a": "p1"}, {"query_id": "q9", "doc_id_a": "p9"}]
    pools = [{"qid": "q1", "doc_id_b": ["n1", "n2"]}]
    out = collate_pools(pairs, pools)
    assert len(out) == 1 and out[0]["doc_id_b"] == ["n1", "n2"]
    recs = [{"i": i} for i in range(100)]
    sub = subsample(recs, 10, seed=1)
    assert len(sub) == 10 and len({r["i"] for r in sub}) == 10


def test_contrast_controller_decouples_eta_and_difficulty():
    ctrl = ContrastController(
        eta0=0.5, meta_lr=0.05, warmup_steps=1, total_steps=50,
        n_neg=10, threshold=0.5, rate_check=2,
    )
    state = ctrl.init()
    for _ in range(6):
        state = ctrl.update(state, _sig([0.1, 0.2], [0.1, 0.2], [1.0, 1.0]))
    # difficulty bumped by level logic (3 checks passed)
    np.testing.assert_allclose(float(ctrl.difficulty(state)), 0.3, atol=1e-6)
    # eta learned independently (moved off init, not equal to difficulty)
    assert float(state.eta.eta) != 0.5
    assert abs(float(state.eta.eta) - float(ctrl.difficulty(state))) > 1e-3
    m = ctrl.metrics(state)
    assert "eta" in m and "difficulty" in m and "success_rate_window" in m


def test_grad_accumulation_changes_update_cadence():
    from pacednegatives_tpu.train import make_optimizer

    params = {"w": jnp.ones(4)}
    grads = {"w": jnp.ones(4)}
    tx = make_optimizer(0.1, 100, 1, grad_accum_steps=4, grad_clip=None)
    import optax

    state = tx.init(params)
    p = params
    for i in range(7):
        upd, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, upd)
    # 7 micro-steps = 1 applied update (at warmup lr 0) + 3 accumulating:
    # params still at init
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0)
    upd, state = tx.update(grads, state, p)
    p = optax.apply_updates(p, upd)
    assert not np.allclose(np.asarray(p["w"]), 1.0)  # 8th applies with lr > 0


def test_profiling_utils():
    from pacednegatives_tpu.utils.profiling import StepTimer, cost_analysis, debug_nans

    ca = cost_analysis(lambda x: x @ x, jnp.ones((64, 64)))
    assert ca["flops"] > 0

    t = StepTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.summary()["a"]["count"] == 2

    with debug_nans(True):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_milestone_decay_schedule():
    from pacednegatives_tpu.curriculum.eta import linear_warmup_decay, milestone_decay

    base = linear_warmup_decay(1.0, 1, 1000)
    sched = milestone_decay(base, {250: 0.1, 500: 0.1})
    assert abs(float(sched(100)) - float(base(100))) < 1e-9
    np.testing.assert_allclose(float(sched(300)), float(base(300)) * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(600)), float(base(600)) * 0.01, rtol=1e-6)


def test_dataset_tools_cli(tmp_path):
    import json

    from pacednegatives_tpu.cli.dataset_tools import main

    triples = str(tmp_path / "t.jsonl")
    with open(triples, "w") as f:
        for q in range(4):
            f.write(json.dumps({
                "query_id": f"q{q}", "doc_id_a": f"p{q}",
                "doc_id_b": [f"n{q}_{i}" for i in range(8)],
            }) + "\n")

    out1 = str(tmp_path / "sub.jsonl")
    main(["--op", "subset", "--triples", triples, "--num_docs", "3", "--out", out1])
    recs = [json.loads(l) for l in open(out1)]
    assert all(len(r["doc_id_b"]) == 3 for r in recs)

    out2 = str(tmp_path / "bal.jsonl")
    main(["--op", "balanced", "--triples", triples, "--num_docs", "3", "--out", out2])
    recs = [json.loads(l) for l in open(out2)]
    assert recs[0]["doc_id_b"] == ["n0_0", "n0_3", "n0_7"]

    out3 = str(tmp_path / "s.jsonl")
    main(["--op", "sample", "--triples", triples, "--n", "2", "--out", out3])
    assert sum(1 for _ in open(out3)) == 2

    pairs = str(tmp_path / "pairs.tsv")
    with open(pairs, "w") as f:
        f.write("q0\tP0\nq9\tP9\n")
    out4 = str(tmp_path / "c.jsonl")
    main(["--op", "collate", "--pairs", pairs, "--pools", triples, "--out", out4])
    recs = [json.loads(l) for l in open(out4)]
    assert len(recs) == 1 and recs[0]["doc_id_a"] == "P0"


def test_runner_contrast_and_online(tmp_path):
    from pacednegatives_tpu.train.runner import RunConfig, run

    base = dict(
        model="tiny", bf16=False, remat=False, vocab_size=512,
        synthetic_docs=32, synthetic_queries=8, synthetic_pairs=32,
        synthetic_pool=8, max_q_tokens=6, max_d_tokens=16,
        total_steps=16, warmup_steps=4, batch_size=4, chunk_size=2,
    )
    s1 = run(RunConfig(curriculum="contrast", rate_check=2,
                       out_dir=str(tmp_path / "c"), **base))
    assert s1["steps"] == 4
    s2 = run(RunConfig(curriculum="lce", n=2, mining="online", pool_size=8,
                       refresh_every=2, encode_batch=16,
                       out_dir=str(tmp_path / "o"), **base))
    assert s2["steps"] == 4
