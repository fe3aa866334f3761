"""Pallas flash-attention forward: parity vs dense, incl. masks and the
(m, l) statistics used by the flash backward (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.ops.flash import (
    flash_attention_forward,
    flash_attention_reference,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, dk = 2, 4, 16, 24, 8
    q = jnp.asarray(rng.normal(size=(B, H, Lq, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, dk)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(H, Lq, Lk)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((B, Lk)) < 0.8, 0.0, -1e9).astype(np.float32)
    )
    return q, k, v, pos, mask


@pytest.mark.parametrize("qb,kb", [(8, 8), (16, 12), (16, 24)])
def test_forward_parity(data, qb, kb):
    q, k, v, pos, mask = data
    out, m, l = flash_attention_forward(
        q, k, v, pos, mask, q_block=qb, kv_block=kb, interpret=True
    )
    ref = flash_attention_reference(q, k, v, pos, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_statistics_consistent(data):
    """(m, l) must reproduce the dense softmax denominator."""
    q, k, v, pos, mask = data
    out, m, l = flash_attention_forward(
        q, k, v, pos, mask, q_block=8, kv_block=8, interpret=True
    )
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k))
    s = s + np.asarray(pos)[None] + np.asarray(mask)[:, None, None, :]
    np.testing.assert_allclose(np.asarray(m), s.max(-1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(l), np.exp(s - s.max(-1, keepdims=True)).sum(-1), rtol=1e-5
    )


def test_block_size_validation(data):
    q, k, v, pos, mask = data
    with pytest.raises(ValueError, match="multiples"):
        flash_attention_forward(q, k, v, pos, mask, q_block=7, interpret=True)
