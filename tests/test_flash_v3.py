"""Flash v3 (fused projection+attention block) parity tests.

Interpret-mode (CPU) checks of ops/flash_v3.py against a plain-XLA
composition of the same math: q/k/v projection from the fused weight,
T5-style unscaled attention with additive position bias + key mask, and
the output projection. Gradients are compared for every differentiable
input (x, wqkv, wo, pos).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacednegatives_tpu.ops.flash_v3 import (
    NEG_INF,
    flash_v3_eligible,
    fused_self_attention,
)


def _xla_reference(x, wqkv, wo, pos3, key_mask):
    B, L, D = x.shape
    H = pos3.shape[0]
    inner = wo.shape[0]
    dk = inner // H
    qkv = jnp.einsum(
        "bld,dthk->tbhlk", x, wqkv.reshape(D, 3, H, dk)
    )
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s + pos3[None].astype(jnp.float32)
    s = s + key_mask[:, None, None, :].astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return jnp.einsum("bhld,hdo->blo", o, wo.reshape(H, dk, D))


def _case(B=3, L=96, D=128, H=4, dk=64, dtype=jnp.float32, seed=0):
    keys = jax.random.split(jax.random.key(seed), 5)
    inner = H * dk
    x = jax.random.normal(keys[0], (B, L, D), dtype) * 0.5
    wqkv = jax.random.normal(keys[1], (D, 3 * inner), dtype) * 0.05
    wo = jax.random.normal(keys[2], (inner, D), dtype) * 0.05
    pos3 = jax.random.normal(keys[3], (H, L, L), jnp.float32) * 0.3
    lens = jax.random.randint(keys[4], (B,), L // 2, L + 1)
    key_mask = jnp.where(
        jnp.arange(L)[None, :] < lens[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)
    return x, wqkv, wo, pos3, key_mask


def test_forward_parity():
    args = _case()
    y = fused_self_attention(*args, interpret=True)
    ref = _xla_reference(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity():
    x, wqkv, wo, pos3, key_mask = _case(seed=1)
    cot = jax.random.normal(jax.random.key(9), x.shape, x.dtype)

    def loss_v3(x, wqkv, wo, pos3):
        y = fused_self_attention(x, wqkv, wo, pos3, key_mask,
                                 interpret=True)
        return jnp.sum(y * cot)

    def loss_ref(x, wqkv, wo, pos3):
        return jnp.sum(_xla_reference(x, wqkv, wo, pos3, key_mask) * cot)

    g3 = jax.grad(loss_v3, argnums=(0, 1, 2, 3))(x, wqkv, wo, pos3)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wqkv, wo, pos3)
    for a, b, name in zip(g3, gr, ["dx", "dwqkv", "dwo", "dpos"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_padded_length_grads():
    """L=90 pads to 96 inside the wrapper; outputs and every gradient must
    match an unpadded reference (padded rows/cols contribute nothing)."""
    x, wqkv, wo, pos3, key_mask = _case(L=90, seed=2)
    cot = jax.random.normal(jax.random.key(3), x.shape, x.dtype)

    def loss_v3(x, pos3):
        y = fused_self_attention(x, wqkv, wo, pos3, key_mask,
                                 interpret=True)
        return jnp.sum(y * cot)

    def loss_ref(x, pos3):
        return jnp.sum(_xla_reference(x, wqkv, wo, pos3, key_mask) * cot)

    y = fused_self_attention(x, wqkv, wo, pos3, key_mask, interpret=True)
    assert y.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_xla_reference(x, wqkv, wo, pos3, key_mask)),
        rtol=2e-5, atol=2e-5,
    )
    g3 = jax.grad(loss_v3, argnums=(0, 1))(x, pos3)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, pos3)
    for a, b, name in zip(g3, gr, ["dx", "dpos"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=name
        )


def test_bf16_smoke():
    x, wqkv, wo, pos3, key_mask = _case(dtype=jnp.bfloat16, seed=4)
    y = fused_self_attention(x, wqkv, wo, pos3, key_mask, interpret=True)
    ref = _xla_reference(x, wqkv, wo, pos3, key_mask)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_eligibility_gate():
    # CPU backend: ineligible unless the interpret override is passed
    assert not flash_v3_eligible(12, 192, 192, 64, 768)
    ok = lambda *a: flash_v3_eligible(*a, interpret=True)
    assert ok(12, 192, 192, 64, 768)
    assert ok(12, 512, 512, 64, 768)
    assert not ok(12, 192, 256, 64, 768)   # cross-shape
    assert not ok(12, 640, 640, 64, 768)   # too long
    assert not ok(12, 192, 192, 48, 768)   # odd dk
    assert not ok(12, 32, 32, 64, 768)     # too small


def test_attention_wiring():
    """cfg.flash_v3 routes encoder-shaped self-attention through the fused
    kernel: compare attention() output and input grads with the flag on
    (interpret override) vs off on identical params."""
    import pacednegatives_tpu.ops.flash_v3 as mod
    from pacednegatives_tpu.models import t5

    cfg_off = t5.T5Config(
        d_model=128, d_kv=64, num_heads=4, dtype=jnp.float32,
        attention_impl="chunked", attention_chunk=96,
    )
    cfg_on = t5.T5Config(
        d_model=128, d_kv=64, num_heads=4, dtype=jnp.float32,
        attention_impl="chunked", attention_chunk=96, flash_v3=True,
        flash_v3_interpret=True,
    )
    keys = jax.random.split(jax.random.key(7), 6)
    B, L, D, H = 2, 96, 128, 4
    p = {
        "q": jax.random.normal(keys[0], (D, 256)) * 0.05,
        "k": jax.random.normal(keys[1], (D, 256)) * 0.05,
        "v": jax.random.normal(keys[2], (D, 256)) * 0.05,
        "o": jax.random.normal(keys[3], (256, D)) * 0.05,
    }
    x = jax.random.normal(keys[4], (B, L, D)) * 0.5
    shared = jax.random.normal(keys[5], (1, H, L, L), jnp.float32) * 0.3
    per_batch = jnp.where(
        jnp.arange(L) < L - 5, 0.0, NEG_INF
    ).astype(jnp.float32)[None, None, None, :].repeat(B, axis=0)
    bias = (shared, per_batch)

    def run(cfg, x, p):
        return t5.attention(p, cfg, x, x, bias)

    y_on = run(cfg_on, x, p)
    y_off = run(cfg_off, x, p)
    np.testing.assert_allclose(
        np.asarray(y_on), np.asarray(y_off), rtol=2e-5, atol=2e-5
    )
    g_on = jax.grad(lambda x, p: jnp.sum(run(cfg_on, x, p) ** 2),
                    argnums=(0, 1))(x, p)
    g_off = jax.grad(lambda x, p: jnp.sum(run(cfg_off, x, p) ** 2),
                     argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(g_on[0]), np.asarray(g_off[0]),
                               rtol=3e-4, atol=3e-4)
    for k in ("q", "k", "v", "o"):
        np.testing.assert_allclose(
            np.asarray(g_on[1][k]), np.asarray(g_off[1][k]),
            rtol=3e-4, atol=3e-4, err_msg=k,
        )


def test_full_train_step_interpret():
    """flash_v3 through the FULL fused LCE train step (microbatch scan,
    fused-qkv hoist + grad re-split, curriculum update) — the exact graph
    the TPU bench measures — must run and stay close to the flag-off step.
    Catches integration breaks (scan/batching rules, grad-split layout)
    before TPU time is spent on the go/no-go measurement."""
    import dataclasses

    from pacednegatives_tpu.curriculum import EtaController
    from pacednegatives_tpu.data import (
        DeviceCorpus, HashTokenizer, TextCorpus, TokenizedStore, TripletStore,
    )
    from pacednegatives_tpu.models import T5Config, init_params
    from pacednegatives_tpu.train import (
        init_train_state, make_fused_step, make_optimizer, make_train_step,
    )

    tok = HashTokenizer(vocab_size=256)
    corpus = TextCorpus.synthetic(num_docs=16, num_queries=8, seed=0,
                                  doc_len=60, query_len=8)
    # prompt len must clear the >= 64 eligibility floor
    store = TokenizedStore.build(corpus, tok, max_q_tokens=12,
                                 max_d_tokens=48)
    triples = TripletStore.synthetic(corpus, n_pairs=8, n_neg=4, seed=1)
    dc = DeviceCorpus.build(store, triples)
    # T5Config.tiny has d_kv=16 — BELOW the kernel's dk in (64, 128) gate,
    # so the v3 arm would silently measure the XLA path (this exact hole
    # shipped in round 3: the arm passed trivially). Use an eligible head
    # dim and assert below that no ineligibility warning fired.
    cfg0 = dataclasses.replace(T5Config.tiny(vocab_size=256), d_kv=64)
    params = init_params(jax.random.key(0), cfg0)

    import warnings as _warnings

    outs = []
    for v3 in (False, True):
        cfg = dataclasses.replace(cfg0, flash_v3=v3, fused_qkv=True,
                                  flash_v3_interpret=v3)
        ctrl = EtaController(eta0=2.0, meta_lr=0.01, warmup_steps=1,
                             total_steps=8)
        tx = make_optimizer(lr=1e-2, total_steps=8)
        step = make_train_step(cfg, ctrl, tx, loss="lce",
                               n_neg_per_example=2, rel_id=tok.true_id,
                               nrel_id=tok.false_id, microbatches=2)
        fstep = make_fused_step(dc, step, ctrl, loss="lce",
                                n_neg_per_example=2)
        state = init_train_state(params, tx, ctrl.init())
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            state, m = jax.jit(fstep)(state, jnp.arange(4, dtype=jnp.int32))
        if v3:
            bad = [w for w in caught
                   if "flash_v3 requested but ineligible" in str(w.message)]
            assert not bad, f"kernel did not engage: {bad[0].message}"
        outs.append((state, float(m["loss"])))
    (s0, l0), (s1, l1) = outs
    assert np.isfinite(l1)
    assert abs(l0 - l1) < 1e-3, (l0, l1)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_full_train_step_shard_map_matches_single_device():
    """flash_v3 under a dp2 x seq2 mesh (VERDICT r4 item 6): the kernel
    runs per-device inside shard_map, batch rows split over ("data","seq"),
    and the step must match the single-device flash_v3 step exactly —
    GSPMD/shard_map as a pure performance transform (the
    test_sharding_equivalence contract, now including the pallas path)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from pacednegatives_tpu.curriculum import EtaController
    from pacednegatives_tpu.data import (
        DeviceCorpus, HashTokenizer, TextCorpus, TokenizedStore, TripletStore,
    )
    from pacednegatives_tpu.models import T5Config, init_params
    from pacednegatives_tpu.parallel import MeshConfig, create_mesh
    from pacednegatives_tpu.train import (
        init_train_state, make_fused_step, make_optimizer, make_train_step,
    )

    tok = HashTokenizer(vocab_size=256)
    corpus = TextCorpus.synthetic(num_docs=16, num_queries=8, seed=0,
                                  doc_len=60, query_len=8)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=12,
                                 max_d_tokens=48)
    triples = TripletStore.synthetic(corpus, n_pairs=8, n_neg=4, seed=1)
    dc = DeviceCorpus.build(store, triples)
    cfg = dataclasses.replace(
        T5Config.tiny(vocab_size=256), d_kv=64,
        flash_v3=True, fused_qkv=True, flash_v3_interpret=True,
    )
    params0 = init_params(jax.random.key(0), cfg)

    def build_fused(negative_parallel):
        # the row constraint needs a mesh context, so the single-device
        # arm builds without it (pure perf transform either way)
        ctrl = EtaController(eta0=2.0, meta_lr=0.01, warmup_steps=1,
                             total_steps=8)
        tx = make_optimizer(lr=1e-2, total_steps=8)
        # batch 8 pairs, mb=2, n=2 -> per-microbatch attention rows are
        # 4 (pos) and 8 (neg), both divisible by the 4 data*seq shards
        step = make_train_step(cfg, ctrl, tx, loss="lce",
                               n_neg_per_example=2, rel_id=tok.true_id,
                               nrel_id=tok.false_id, microbatches=2)
        fused = make_fused_step(dc, step, ctrl, loss="lce",
                                n_neg_per_example=2,
                                negative_parallel=negative_parallel)
        return ctrl, tx, fused

    pair_idx = jnp.arange(8, dtype=jnp.int32) % dc.num_pairs

    ctrl, tx, fused = build_fused(False)
    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params0), tx, ctrl.init())
    state1, m1 = jax.jit(fused)(state, pair_idx)

    mesh = create_mesh(MeshConfig(data=2, seq=2, model=1),
                       devices=jax.devices()[:4])
    ctrl, tx, fused = build_fused(True)
    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params0), tx, ctrl.init())
    state = state._replace(
        params=jax.device_put(state.params, NamedSharding(mesh, P())))
    idx_sh = jax.device_put(pair_idx, NamedSharding(mesh, P(("data", "seq"))))
    with mesh:
        state4, m4 = jax.jit(fused)(state, idx_sh)

    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_flash_v3_rejects_tensor_parallel_mesh():
    """model-axis > 1 must be rejected loudly (the kernel would force an
    all-gather of the sharded attention weights every layer)."""
    import dataclasses

    from pacednegatives_tpu.models import T5Config, init_params, t5
    from pacednegatives_tpu.parallel import MeshConfig, create_mesh

    cfg = dataclasses.replace(
        T5Config.tiny(vocab_size=256), d_kv=64,
        flash_v3=True, fused_qkv=True, flash_v3_interpret=True,
    )
    params = init_params(jax.random.key(0), cfg)
    mesh = create_mesh(MeshConfig(data=4, model=2))
    ids = jnp.ones((4, 64), jnp.int32)
    labels = jnp.ones((4, 2), jnp.int32)
    with mesh:
        with pytest.raises(ValueError, match="tensor"):
            jax.jit(lambda p, i, l: t5.forward_logits(p, cfg, i, l))(
                params, ids, labels)


def test_fused_qkv_param_wiring():
    """With pre-fused params (the production hoist), the v3 branch consumes
    p['qkv'] directly and grads split back losslessly."""
    from pacednegatives_tpu.models import t5

    cfg_on = t5.T5Config(
        d_model=128, d_kv=64, num_heads=4, dtype=jnp.float32,
        attention_impl="chunked", attention_chunk=96,
        flash_v3=True, fused_qkv=True, flash_v3_interpret=True,
    )
    keys = jax.random.split(jax.random.key(11), 6)
    B, L, D, H = 2, 96, 128, 4
    p_sep = {
        "q": jax.random.normal(keys[0], (D, 256)) * 0.05,
        "k": jax.random.normal(keys[1], (D, 256)) * 0.05,
        "v": jax.random.normal(keys[2], (D, 256)) * 0.05,
        "o": jax.random.normal(keys[3], (256, D)) * 0.05,
    }
    p_fused = {
        "qkv": jnp.concatenate([p_sep["q"], p_sep["k"], p_sep["v"]], axis=-1),
        "o": p_sep["o"],
    }
    x = jax.random.normal(keys[4], (B, L, D)) * 0.5
    shared = jax.random.normal(keys[5], (1, H, L, L), jnp.float32) * 0.3
    bias = (shared, None)

    y_fused = t5.attention(p_fused, cfg_on, x, x, bias)
    cfg_off = t5.T5Config(
        d_model=128, d_kv=64, num_heads=4, dtype=jnp.float32,
        attention_impl="chunked", attention_chunk=96,
    )
    y_ref = t5.attention(p_sep, cfg_off, x, x, bias)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )
