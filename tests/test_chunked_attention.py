"""Chunked (online-softmax) attention must match dense exactly, including
padding masks, causal decoding, cross-attention, and gradients."""

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
    ids = rng.integers(2, 256, size=(3, 20)).astype(np.int32)
    ids[0, 15:] = 0  # padding
    ids[2, 7:] = 0
    labels = rng.integers(2, 256, size=(3, 2)).astype(np.int32)
    return cfg, params, jnp.asarray(ids), jnp.asarray(labels)


@pytest.mark.parametrize("chunk", [4, 7, 20, 64])
def test_chunked_matches_dense(setup, chunk):
    """chunk=7 exercises the padded-tail path (20 % 7 != 0); chunk=64 the
    single-oversized-chunk path."""
    cfg, params, ids, labels = setup
    dense = forward_logits(params, cfg, ids, labels)
    ccfg = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=chunk
    )
    chunked = forward_logits(params, ccfg, ids, labels)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(dense), atol=2e-5, rtol=2e-5
    )


def test_chunked_gradients_match(setup):
    cfg, params, ids, labels = setup
    ccfg = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=8,
        remat=True, remat_policy="dots_nobatch",
    )

    def loss(p, c):
        logits = forward_logits(p, c, ids, labels)
        onehot = jax.nn.one_hot(labels, c.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    g_dense = jax.grad(lambda p: loss(p, cfg))(params)
    g_chunk = jax.jit(jax.grad(lambda p: loss(p, ccfg)))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_dense), jax.tree_util.tree_leaves(g_chunk)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-4
        )


def test_chunked_with_scan_layers(setup):
    cfg, params, ids, labels = setup
    ccfg = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=8, scan_layers=True
    )
    dense = forward_logits(params, cfg, ids, labels)
    got = forward_logits(params, ccfg, ids, labels)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense), atol=2e-5, rtol=2e-5
    )


def test_chunked_encode_only_and_scoring(setup):
    from pacednegatives_tpu.models import score_batch

    cfg, params, ids, _ = setup
    ccfg = dataclasses.replace(cfg, attention_impl="chunked", attention_chunk=8)
    np.testing.assert_allclose(
        np.asarray(t5.encode(params, ccfg, ids)),
        np.asarray(t5.encode(params, cfg, ids)),
        atol=2e-5, rtol=2e-5,
    )
    s_dense = score_batch(params, cfg, ids, rel_id=7, nrel_id=11)
    s_chunk = score_batch(params, ccfg, ids, rel_id=7, nrel_id=11)
    np.testing.assert_allclose(
        np.asarray(s_chunk), np.asarray(s_dense), atol=2e-5, rtol=2e-5
    )
