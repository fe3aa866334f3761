"""scan_layers must be a pure compile-time transform: identical outputs and
gradients vs the unrolled Python loop."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import T5Config, forward_logits, init_params
from pacednegatives_tpu.models import t5


@pytest.fixture(scope="module")
def setup():
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 256, size=(3, 12)).astype(np.int32)
    ids[1, 8:] = 0
    labels = rng.integers(2, 256, size=(3, 2)).astype(np.int32)
    return cfg, params, jnp.asarray(ids), jnp.asarray(labels)


def test_scan_matches_loop_forward(setup):
    cfg, params, ids, labels = setup
    loop_logits = forward_logits(params, cfg, ids, labels)
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    scan_logits = forward_logits(params, scan_cfg, ids, labels)
    np.testing.assert_allclose(
        np.asarray(scan_logits), np.asarray(loop_logits), atol=1e-5, rtol=1e-5
    )


def test_scan_matches_loop_with_remat(setup):
    cfg, params, ids, labels = setup
    scan_cfg = dataclasses.replace(
        cfg, scan_layers=True, remat=True, remat_policy="dots_nobatch"
    )
    loop_logits = forward_logits(params, cfg, ids, labels)
    scan_logits = jax.jit(
        lambda p: forward_logits(p, scan_cfg, ids, labels)
    )(params)
    np.testing.assert_allclose(
        np.asarray(scan_logits), np.asarray(loop_logits), atol=1e-5, rtol=1e-5
    )


def test_scan_gradients_match(setup):
    cfg, params, ids, labels = setup
    scan_cfg = dataclasses.replace(cfg, scan_layers=True, remat=True)

    def loss(p, c):
        logits = forward_logits(p, c, ids, labels)
        onehot = jax.nn.one_hot(labels, c.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    g_loop = jax.grad(lambda p: loss(p, cfg))(params)
    g_scan = jax.grad(lambda p: loss(p, scan_cfg))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_loop), jax.tree_util.tree_leaves(g_scan)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_scan_with_dropout_runs(setup):
    cfg, params, ids, labels = setup
    scan_cfg = dataclasses.replace(cfg, scan_layers=True, dropout_rate=0.1)
    out = forward_logits(
        params, scan_cfg, ids, labels,
        deterministic=False, dropout_key=jax.random.key(1),
    )
    assert bool(jnp.isfinite(out).all())
    # and differs from deterministic output (dropout active)
    det = forward_logits(params, scan_cfg, ids, labels)
    assert float(jnp.abs(out - det).max()) > 0


def test_scan_encode_only(setup):
    cfg, params, ids, _ = setup
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    a = t5.encode(params, cfg, ids)
    b = t5.encode(params, scan_cfg, ids)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)
