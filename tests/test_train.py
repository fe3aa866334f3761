"""End-to-end training tests: tiny T5 + synthetic corpus, every curriculum
family, checkpoint resume, and a sharded multi-device run on the 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import (
    EtaController,
    InterpController,
    LevelController,
    MetaWeightTable,
)
from pacednegatives_tpu.curriculum.eta import linear_warmup_decay
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.parallel import create_mesh, MeshConfig, param_shardings, shard_batch
from pacednegatives_tpu.train import (
    TrainLoop,
    MetricWriter,
    init_train_state,
    make_fused_step,
    make_meta_train_step,
    make_optimizer,
    make_train_step,
)
from pacednegatives_tpu.train.loop import restore_checkpoint, save_checkpoint


VOCAB = 512


@pytest.fixture(scope="module")
def setup():
    corpus = TextCorpus.synthetic(num_docs=48, num_queries=8, seed=0)
    tok = HashTokenizer(vocab_size=VOCAB)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=24)
    triples = TripletStore.synthetic(corpus, n_pairs=32, n_neg=10, seed=1)
    dc = DeviceCorpus.build(store, triples)
    cfg = T5Config.tiny(vocab_size=VOCAB)
    params = init_params(jax.random.key(0), cfg)
    return corpus, tok, store, triples, dc, cfg, params


def _run(setup, controller, loss="pair", n=1, steps=6, batch_size=4):
    _, tok, store, triples, dc, cfg, params = setup
    # chunk_fn donates the state, so each run needs its own param buffers
    params = jax.tree_util.tree_map(jnp.copy, params)
    tx = make_optimizer(lr=1e-3, total_steps=steps)
    step_fn = make_train_step(
        cfg, controller, tx, loss=loss, n_neg_per_example=n,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    fused = make_fused_step(dc, step_fn, controller, loss=loss, n_neg_per_example=n)
    state = init_train_state(params, tx, controller.init())
    loop = TrainLoop(
        fused_step=fused, num_pairs=len(triples), batch_size=batch_size,
        chunk_size=3,
    )
    writer = MetricWriter(None)
    state = loop.run(state, steps, writer)
    return state, writer.history


def test_interp_training_runs_and_difficulty_ramps(setup):
    ctrl = InterpController(start=0.0, end=1.0, num_steps=16, batch_size=4)
    state, hist = _run(setup, ctrl)
    assert int(state.step) == 6
    assert all(np.isfinite(h["loss"]) for h in hist if "loss" in h)
    assert float(ctrl.difficulty(state.curriculum)) > 0.5


def test_level_training_accumulates_success(setup):
    ctrl = LevelController(n_neg=10, threshold=-1.0, check_every=2)
    state, _ = _run(setup, ctrl)
    # threshold -1 -> bump every check: 3 bumps in 6 steps
    np.testing.assert_allclose(float(state.curriculum.difficulty), 0.3, atol=1e-6)


def test_eta_training_updates_eta(setup):
    # Untrained-model CE ~ log(vocab) ~ 6.2; eta0 must sit above it so some
    # examples are admitted (below threshold) and the meta grad is nonzero —
    # same dynamics as the reference starting from pretrained t5 with eta=0.5.
    ctrl = EtaController(
        eta0=8.0, meta_lr=0.05, warmup_steps=1, total_steps=6, eta_max=10.0
    )
    state, hist = _run(setup, ctrl)
    assert float(state.curriculum.eta) != 8.0
    assert "eta" in hist[0] and "meta_loss" in hist[0]


def test_lce_training_with_sampled_negatives(setup):
    ctrl = EtaController(
        eta0=0.3, kind="lce", objective="weighted_ce", optimizer="adamw",
        warmup_steps=1, total_steps=6,
    )
    state, hist = _run(setup, ctrl, loss="lce", n=3)
    assert int(state.step) == 6
    assert np.isfinite(hist[-2]["loss"])


def test_loss_decreases_over_training(setup):
    """Sanity: on a tiny fixed task the CE objective must trend down."""
    ctrl = InterpController(start=0.0, end=0.0, num_steps=1)
    state, hist = _run(setup, ctrl, steps=30, batch_size=8)
    losses = [h["loss"] for h in hist if "loss" in h]
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("variant", ["cheap", "std"])
def test_meta_bilevel_step(setup, variant):
    _, tok, store, triples, dc, cfg, params = setup
    table = MetaWeightTable(num_batches=8, batch_size=4)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    sched = linear_warmup_decay(1e-2, 1, 4)
    step = jax.jit(
        make_meta_train_step(
            cfg, table, tx, sched, variant=variant,
            rel_id=tok.true_id, nrel_id=tok.false_id,
        )
    )
    state = init_train_state(params, tx, table.init())
    batch = dc.pair_batch(jnp.arange(4), jnp.float32(0.2))
    state, metrics = step(state, batch, jnp.int32(1))
    assert np.isfinite(float(metrics["loss"]))
    w = np.asarray(table.lookup(state.curriculum, jnp.int32(1)))
    assert not np.allclose(w, 1.0)  # weights moved off init
    assert np.all((w > 0) & (w < 1))  # sigmoid range
    # untouched rows stay 1
    np.testing.assert_allclose(
        np.asarray(table.lookup(state.curriculum, jnp.int32(0))), 1.0
    )


def test_checkpoint_roundtrip(setup, tmp_path):
    ctrl = EtaController(eta0=0.5, meta_lr=0.01, warmup_steps=1, total_steps=6)
    state, _ = _run(setup, ctrl, steps=3)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    _, tok, store, triples, dc, cfg, params = setup
    tx = make_optimizer(lr=1e-3, total_steps=6)
    template = init_train_state(params, tx, ctrl.init())
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        float(restored.curriculum.eta), float(state.curriculum.eta)
    )
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_training_on_8_device_mesh(setup):
    """Data-parallel training across the virtual 8-CPU mesh: params
    replicated, batch sharded; one fused step must compile and run."""
    _, tok, store, triples, dc, cfg, params = setup
    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshConfig(data=8, model=1))

    ctrl = InterpController(start=0.0, end=1.0, num_steps=10)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    step_fn = make_train_step(
        cfg, ctrl, tx, rel_id=tok.true_id, nrel_id=tok.false_id
    )
    fused = make_fused_step(dc, step_fn, ctrl)
    state = init_train_state(params, tx, ctrl.init())

    shardings = param_shardings(mesh, state.params)
    state = state._replace(params=jax.device_put(state.params, shardings))

    from jax.sharding import NamedSharding, PartitionSpec as P

    pair_idx = jax.device_put(
        jnp.arange(16, dtype=jnp.int32), NamedSharding(mesh, P("data"))
    )
    with mesh:
        state2, metrics = jax.jit(fused)(state, pair_idx)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_meta_std_gradient_matches_finite_differences(setup):
    """SURVEY §7 hard-part 1 oracle: the std (StdWrapper) bilevel update's
    gradient-THROUGH-the-virtual-SGD-update must match central finite
    differences of the outer objective

        F(v) = weighted_CE(theta - lr * d/dtheta weighted_CE(theta, v), v)
               - sum(v)

    evaluated with real model applies. The stored table row after one step
    must equal sigmoid(v - lr * gv_fd) — binding the in-step jax.grad
    composition (train/step.py make_meta_train_step variant="std") to the
    numerical derivative, not to another autodiff expression."""
    _, tok, store, triples, dc, cfg, params = setup
    from pacednegatives_tpu.train.step import _ce_and_first_logits

    table = MetaWeightTable(num_batches=8, batch_size=3)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    lr = 0.05  # constant meta lr so the oracle sees the same value
    step = jax.jit(
        make_meta_train_step(
            cfg, table, tx, lambda s: jnp.float32(lr), variant="std",
            rel_id=tok.true_id, nrel_id=tok.false_id,
        )
    )
    state = init_train_state(params, tx, table.init())
    batch = dc.pair_batch(jnp.arange(3), jnp.float32(0.4))

    def per_example(p):
        pce, _ = _ce_and_first_logits(
            p, cfg, batch["pos_ids"], batch["pos_mask"], batch["pos_labels"]
        )
        nce, _ = _ce_and_first_logits(
            p, cfg, batch["neg_ids"], batch["neg_mask"], batch["neg_labels"]
        )
        return pce, nce

    def F(v):
        def weighted(p):
            pce, nce = per_example(p)
            return jnp.sum(pce * v) / 3 + jnp.sum(nce * v) / 3

        g = jax.grad(weighted)(state.params)
        virt = jax.tree_util.tree_map(lambda p_, g_: p_ - lr * g_,
                                      state.params, g)
        pce, nce = per_example(virt)
        return float(jnp.sum(pce * v) / 3 + jnp.sum(nce * v) / 3
                     - jnp.sum(v))

    v0 = np.ones(3, np.float32)
    eps = 1e-2
    gv_fd = np.zeros(3, np.float64)
    for i in range(3):
        e = np.zeros(3, np.float32)
        e[i] = eps
        gv_fd[i] = (F(jnp.asarray(v0 + e)) - F(jnp.asarray(v0 - e))) / (2 * eps)

    new_state, _ = step(state, batch, jnp.int32(2))
    got = np.asarray(table.lookup(new_state.curriculum, jnp.int32(2)))
    want = 1.0 / (1.0 + np.exp(-(v0 - lr * gv_fd)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)
    # the gradient is non-trivial (weights actually moved off sigmoid(1))
    assert np.max(np.abs(gv_fd)) > 0.1
