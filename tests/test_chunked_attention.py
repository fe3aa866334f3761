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


def test_bf16_attention_residual_grads_close(setup):
    """attn_residual_dtype="bf16" stores the VJP's saved attention output
    in bf16 (it feeds only D = sum(g*out) in the backward). The forward
    must be BIT-identical (residual dtype can't affect the primal), and
    gradients must agree with the fp32-residual path to bf16 rounding."""
    cfg, params, ids, labels = setup
    base = dataclasses.replace(cfg, attention_impl="chunked", attention_chunk=8)
    bf16 = dataclasses.replace(base, attn_residual_dtype="bf16")

    np.testing.assert_array_equal(
        np.asarray(forward_logits(params, bf16, ids, labels)),
        np.asarray(forward_logits(params, base, ids, labels)),
    )

    def loss(p, c):
        logits = forward_logits(p, c, ids, labels)
        onehot = jax.nn.one_hot(labels, c.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    g32 = jax.jit(jax.grad(lambda p: loss(p, base)))(params)
    g16 = jax.jit(jax.grad(lambda p: loss(p, bf16)))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 rounding of out (~2^-8 relative) enters only through D;
        # it compounds slightly through ds = p*(dp - D) (measured max
        # normalized delta 7.5e-3 on the tiny model's rel-bias tables)
        denom = np.maximum(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / denom, a / denom, atol=1.5e-2)


def test_ffn_custom_vjp_matches_autodiff(setup):
    """ffn_custom_vjp saves only the post-ReLU hidden; outputs must be
    bit-identical (same forward ops) and gradients bit-close (identical
    einsum order/dtypes — only the residual set differs)."""
    cfg, params, ids, labels = setup
    fcfg = dataclasses.replace(cfg, ffn_custom_vjp=True)

    np.testing.assert_array_equal(
        np.asarray(forward_logits(params, fcfg, ids, labels)),
        np.asarray(forward_logits(params, cfg, ids, labels)),
    )

    def loss(p, c):
        logits = forward_logits(p, c, ids, labels)
        onehot = jax.nn.one_hot(labels, c.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    g_ref = jax.jit(jax.grad(lambda p: loss(p, cfg)))(params)
    g_vjp = jax.jit(jax.grad(lambda p: loss(p, fcfg)))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_vjp)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
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


def test_pallas_forward_matches_xla_flash_forward():
    """_pallas_forward (Mosaic, interpret mode on CPU) must reproduce
    _flash_forward's (out, m, l) exactly enough that the shared XLA flash
    backward stays correct when the forward is swapped."""
    from unittest import mock

    import pacednegatives_tpu.ops.flash as flash_mod
    from pacednegatives_tpu.models.t5 import _flash_forward, _pallas_forward

    rng = np.random.default_rng(0)
    B, Lq, H, dk = 2, 128, 4, 64
    Lk = 128
    q = jnp.asarray(rng.standard_normal((B, H, Lq, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    shared = jnp.asarray(rng.standard_normal((1, H, Lq, Lk)), jnp.float32)
    per_batch = jnp.where(
        jnp.arange(Lk)[None, None, None, :] < 100, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((B, 1, 1, 1))

    out_x, (m_x, l_x, obh_x) = _flash_forward(64, q, k, v, shared, per_batch)

    orig = flash_mod.flash_attention_forward
    orig_v2 = flash_mod.flash_attention_forward_v2
    with mock.patch.object(
        flash_mod, "flash_attention_forward",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ), mock.patch.object(
        flash_mod, "flash_attention_forward_v2",
        lambda *a, **kw: orig_v2(*a, **{**kw, "interpret": True}),
    ):
        out_p, (m_p, l_p, obh_p) = _pallas_forward(
            64, 128, q, k, v, shared, per_batch
        )

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obh_p), np.asarray(obh_x),
                               rtol=2e-5, atol=2e-5)


def test_pallas_backward_matches_xla_flash_backward():
    """Full custom-VJP parity: gradients through _flash_core with the
    Mosaic fwd+bwd (interpret mode) must match the XLA flash path for
    q/k/v and the learned position bias. The per-batch mask grad is
    intentionally zero in the Pallas path (derived from integer masks)."""
    from unittest import mock

    import pacednegatives_tpu.ops.flash as flash_mod
    from pacednegatives_tpu.models import t5 as t5_mod

    rng = np.random.default_rng(1)
    B, Lq, H, dk = 2, 128, 4, 64
    Lk = 128
    q = jnp.asarray(rng.standard_normal((B, H, Lq, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    shared = jnp.asarray(
        rng.standard_normal((1, H, Lq, Lk)) * 0.5, jnp.float32
    )
    per_batch = (
        jnp.where(jnp.arange(Lk)[None, None, None, :] < 100, 0.0, -1e9)
        .astype(jnp.float32) * jnp.ones((B, 1, 1, 1))
    )
    cot = jnp.asarray(rng.standard_normal((B, H, Lq, dk)), jnp.float32)

    def loss(impl, q, k, v, shared):
        out = t5_mod._flash_core(64, impl, "fp32", q, k, v, shared, per_batch)
        return jnp.sum(out * cot)

    gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3))(
        q, k, v, shared
    )
    orig_fwd = flash_mod.flash_attention_forward
    orig_bwd = flash_mod.flash_attention_backward
    orig_fwd2 = flash_mod.flash_attention_forward_v2
    orig_bwd2 = flash_mod.flash_attention_backward_v2
    with mock.patch.object(
        flash_mod, "flash_attention_forward",
        lambda *a, **kw: orig_fwd(*a, **{**kw, "interpret": True}),
    ), mock.patch.object(
        flash_mod, "flash_attention_backward",
        lambda *a, **kw: orig_bwd(*a, **{**kw, "interpret": True}),
    ), mock.patch.object(
        flash_mod, "flash_attention_forward_v2",
        lambda *a, **kw: orig_fwd2(*a, **{**kw, "interpret": True}),
    ), mock.patch.object(
        flash_mod, "flash_attention_backward_v2",
        lambda *a, **kw: orig_bwd2(*a, **{**kw, "interpret": True}),
    ):
        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(
            q, k, v, shared
        )
    for name, a, b in zip(("dq", "dk", "dv", "dpos"), gx, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_flash_v2_kernels_match_v1():
    """v2 (coarse-grid, whole-key, unrolled-heads) must agree with v1 on
    eligible shapes, including the accumulated dk/dv and dpos outputs."""
    from pacednegatives_tpu.ops import flash as F

    rng = np.random.default_rng(2)
    B, H, Lq, Lk, dk = 3, 4, 256, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, Lq, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, dk)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((H, Lq, Lk)) * 0.3, jnp.float32)
    key_mask = jnp.where(jnp.arange(Lk)[None, :] < 100, 0.0, -1e9).astype(
        jnp.float32
    ) * jnp.ones((B, 1))
    g = jnp.asarray(rng.standard_normal((B, H, Lq, dk)), jnp.float32)

    o1, m1, l1 = F.flash_attention_forward(
        q, k, v, pos, key_mask, interpret=True, out_dtype=jnp.float32
    )
    o2, m2, l2 = F.flash_attention_forward_v2(
        q, k, v, pos, key_mask, interpret=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-5, atol=2e-5)

    D = jnp.sum(g * o1, axis=-1)
    g1 = F.flash_attention_backward(
        q, k, v, pos, key_mask, m1, l1, D, g, interpret=True
    )
    g2 = F.flash_attention_backward_v2(
        q, k, v, pos, key_mask, m1, l1, D, g, interpret=True
    )
    for name, a, b in zip(("dq", "dk", "dv", "dpos"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4, err_msg=name
        )


def test_packed_pair_attention_matches_dense():
    """packed_heads: block-diagonal head-pair attention must equal the
    dense per-head path (same math, different GEMM tiling)."""
    import dataclasses

    from pacednegatives_tpu.models import T5Config, forward_logits, init_params

    cfg = T5Config.tiny(vocab_size=128)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 128, (4, 24)), jnp.int32)
    ids = ids * (jnp.arange(24) < 20)  # some padding
    mask = (ids != 0).astype(jnp.int32)
    labels = jnp.asarray(rng.integers(2, 128, (4, 2)), jnp.int32)

    cfg_d = dataclasses.replace(cfg, attention_impl="dense")
    cfg_p = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=64, packed_heads=True
    )
    out_d = forward_logits(params, cfg_d, ids, labels, mask)
    out_p = forward_logits(params, cfg_p, ids, labels, mask)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )

    # gradients must match too (autodiff through the block-diag construction)
    def loss(ps, c):
        lg = forward_logits(ps, c, ids, labels, mask)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 5])

    g_d = jax.grad(loss)(params, cfg_d)
    g_p = jax.grad(loss)(params, cfg_p)
    for kd, kp in zip(jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(kd), np.asarray(kp), rtol=3e-3, atol=3e-5)


def test_packed_lanes_attention_matches_dense():
    """packed_lanes: head-pair lane packing (projection to (B, H/2, L, 2dk)
    + reshape-unpacked scores/AV) must equal the dense per-head path in
    outputs AND gradients — it is the same math with different GEMM tiling
    and zero extra FLOPs."""
    import dataclasses

    from pacednegatives_tpu.models import T5Config, forward_logits, init_params

    cfg = T5Config.tiny(vocab_size=128)
    params = init_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(2, 128, (4, 24)), jnp.int32)
    ids = ids * (jnp.arange(24) < 20)  # some padding
    mask = (ids != 0).astype(jnp.int32)
    labels = jnp.asarray(rng.integers(2, 128, (4, 2)), jnp.int32)

    cfg_d = dataclasses.replace(cfg, attention_impl="dense")
    cfg_p = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=64, packed_lanes=True
    )
    out_d = forward_logits(params, cfg_d, ids, labels, mask)
    out_p = forward_logits(params, cfg_p, ids, labels, mask)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )

    def loss(ps, c):
        lg = forward_logits(ps, c, ids, labels, mask)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 5])

    g_d = jax.grad(loss)(params, cfg_d)
    g_p = jax.grad(loss)(params, cfg_p)
    for kd, kp in zip(jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(kd), np.asarray(kp), rtol=3e-3, atol=3e-5)


def test_packed_lanes_multichunk_fallback():
    """packed_lanes must silently fall back to the chunked path when the
    key length exceeds the chunk (multi-chunk regime it doesn't support),
    and still produce dense-equal outputs."""
    import dataclasses

    from pacednegatives_tpu.models import T5Config, forward_logits, init_params

    cfg = T5Config.tiny(vocab_size=128)
    params = init_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(2, 128, (2, 40)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.asarray(rng.integers(2, 128, (2, 2)), jnp.int32)

    cfg_d = dataclasses.replace(cfg, attention_impl="dense")
    cfg_p = dataclasses.replace(
        cfg, attention_impl="chunked", attention_chunk=16, packed_lanes=True
    )
    out_d = forward_logits(params, cfg_d, ids, labels, mask)
    out_p = forward_logits(params, cfg_p, ids, labels, mask)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )
