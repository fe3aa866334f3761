"""A/B microbenchmark: attention-block layouts on the real chip.

Variant blhd — today's t5.py decomposition: project to (B,L,H*dk), reshape
to (B,L,H,dk), scores "bqhd,bkhd->bhqk", AV back to (B,L,H*dk), out proj.
Variant bhld — project straight to head-major (B,H,L,dk) via a reshaped
weight ("bld,dhk->bhlk"), scores "bhqd,bhkd->bhqk" (pure batched GEMM, no
implicit transposes), AV "bhqk,bhkd->bhqd", out proj "bhld,hdo->blo".

Times N fwd+bwd layer stacks at monoT5-base shapes. Decides whether the
(B,H,L,dk)-native refactor of models/t5.py attention is worth doing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("AB_B", "32"))
L = int(os.environ.get("AB_L", "188"))
D, H, DK = 768, 12, 64
LAYERS = int(os.environ.get("AB_LAYERS", "12"))
STEPS = int(os.environ.get("AB_STEPS", "30"))


def make_params(key):
    ks = jax.random.split(key, 4 * LAYERS)
    p = []
    s = 0.02
    for i in range(LAYERS):
        p.append({
            "q": jax.random.normal(ks[4 * i], (D, H * DK), jnp.bfloat16) * s,
            "k": jax.random.normal(ks[4 * i + 1], (D, H * DK), jnp.bfloat16) * s,
            "v": jax.random.normal(ks[4 * i + 2], (D, H * DK), jnp.bfloat16) * s,
            "o": jax.random.normal(ks[4 * i + 3], (H * DK, D), jnp.bfloat16) * s,
        })
    return p


def attn_blhd(p, x, bias):
    q = jnp.einsum("bld,dk->blk", x, p["q"]).reshape(B, L, H, DK)
    k = jnp.einsum("bld,dk->blk", x, p["k"]).reshape(B, L, H, DK)
    v = jnp.einsum("bld,dk->blk", x, p["v"]).reshape(B, L, H, DK)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) + bias
    m = s.max(axis=-1, keepdims=True)
    w = jnp.exp(s - m)
    w = (w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, H * DK)
    return x + jnp.einsum("bli,id->bld", o, p["o"])


def attn_bhld(p, x, bias):
    wq = p["q"].reshape(D, H, DK)
    wk = p["k"].reshape(D, H, DK)
    wv = p["v"].reshape(D, H, DK)
    wo = p["o"].reshape(H, DK, D)
    q = jnp.einsum("bld,dhk->bhlk", x, wq)
    k = jnp.einsum("bld,dhk->bhlk", x, wk)
    v = jnp.einsum("bld,dhk->bhlk", x, wv)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) + bias
    m = s.max(axis=-1, keepdims=True)
    w = jnp.exp(s - m)
    w = (w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return x + jnp.einsum("bhld,hdo->blo", o, wo)


def attn_bhkl(p, x, bias):
    """dk-sublane / L-minor layout: projection outputs (B, H, dk, L) so the
    GEMM minor dim is L (188 -> padded 256 lanes, 73% util) instead of
    dk=64 (50%); AV contracts over L (large K dim)."""
    wq = p["q"].reshape(D, H, DK)
    wk = p["k"].reshape(D, H, DK)
    wv = p["v"].reshape(D, H, DK)
    wo = p["o"].reshape(H, DK, D)
    q = jnp.einsum("bld,dhk->bhkl", x, wq)
    k = jnp.einsum("bld,dhk->bhkl", x, wk)
    v = jnp.einsum("bld,dhk->bhkl", x, wv)
    s = jnp.einsum("bhdq,bhdk->bhqk", q, k,
                   preferred_element_type=jnp.float32) + bias
    m = s.max(axis=-1, keepdims=True)
    w = jnp.exp(s - m)
    w = (w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)).astype(x.dtype)
    o = jnp.einsum("bhqk,bhdk->bhdq", w, v)
    return x + jnp.einsum("bhdl,hdo->blo", o, wo)


def attn_packed(p, x, bias):
    """Head-PAIR lane packing: projections/out-proj run with a 128-wide
    minor dim (full MXU lanes) on (B, H/2, L, 2*dk); scores/AV unpack the
    pair via a reshape into an extra batch dim (t), never mixing heads."""
    G = H // 2
    wq = p["q"].reshape(D, G, 2 * DK)
    wk = p["k"].reshape(D, G, 2 * DK)
    wv = p["v"].reshape(D, G, 2 * DK)
    wo = p["o"].reshape(G, 2 * DK, D)
    q = jnp.einsum("bld,dgk->bglk", x, wq)  # (B, G, L, 128)
    k = jnp.einsum("bld,dgk->bglk", x, wk)
    v = jnp.einsum("bld,dgk->bglk", x, wv)
    qt = q.reshape(B, G, L, 2, DK)
    kt = k.reshape(B, G, L, 2, DK)
    vt = v.reshape(B, G, L, 2, DK)
    bias_t = bias.reshape(1, G, 2, L, L)
    s = jnp.einsum("bgqtd,bgktd->bgtqk", qt, kt,
                   preferred_element_type=jnp.float32) + bias_t
    m = s.max(axis=-1, keepdims=True)
    w = jnp.exp(s - m)
    w = (w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)).astype(x.dtype)
    o = jnp.einsum("bgtqk,bgktd->bgqtd", w, vt).reshape(B, G, L, 2 * DK)
    return x + jnp.einsum("bglk,gko->blo", o, wo)


def run(name, attn):
    key = jax.random.key(0)
    params = make_params(key)
    x0 = jax.random.normal(jax.random.key(1), (B, L, D), jnp.bfloat16)
    bias = jax.random.normal(jax.random.key(2), (1, H, L, L), jnp.float32)

    def loss(params, x):
        for p in params:
            x = attn(p, x, bias)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    out = g(params, x0)
    float(np.asarray(out[0]["q"][0, 0]))  # compile + sync
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = g(out_to_params(out, params, i), x0)
    # fetch-sync with data dependency on the whole chain
    float(np.asarray(out[-1]["o"][-1, -1]))
    dt = (time.perf_counter() - t0) / STEPS
    # per-step flops: fwd 4 proj + qk + av; bwd 2x
    flops = LAYERS * 3 * (4 * 2 * B * L * D * H * DK + 2 * 2 * B * H * L * L * DK)
    print(f"{name}: {dt * 1e3:7.2f} ms/iter  {flops / dt / 1e12:6.1f} TF/s")
    return dt


def out_to_params(grads, params, i):
    # perturb params with the grads so the timed programs aren't identical
    # (inputs, program) pairs — the axon runtime dedups repeat executions
    return jax.tree_util.tree_map(
        lambda p, g: p - (1e-6 * (i + 1)) * g.astype(p.dtype), params, grads
    )


DFF = 3072


def make_block_params(key):
    ks = jax.random.split(key, 6 * LAYERS)
    p = []
    s = 0.02
    for i in range(LAYERS):
        p.append({
            "q": jax.random.normal(ks[6 * i], (D, H * DK), jnp.bfloat16) * s,
            "k": jax.random.normal(ks[6 * i + 1], (D, H * DK), jnp.bfloat16) * s,
            "v": jax.random.normal(ks[6 * i + 2], (D, H * DK), jnp.bfloat16) * s,
            "o": jax.random.normal(ks[6 * i + 3], (H * DK, D), jnp.bfloat16) * s,
            "wi": jax.random.normal(ks[6 * i + 4], (D, DFF), jnp.bfloat16) * s,
            "wo": jax.random.normal(ks[6 * i + 5], (DFF, D), jnp.bfloat16) * s,
            "s1": jnp.ones((D,), jnp.float32),
            "s2": jnp.ones((D,), jnp.float32),
        })
    return p


def _rms(x, scale):
    h = x.astype(jnp.float32)
    h = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)
    return (h * scale).astype(jnp.bfloat16)


def make_block(attn):
    """Full T5-style encoder block: pre-norm attn + residual, pre-norm
    relu-FFN + residual — the decisive harness for layout choices (the
    attention-only harness overstated head-major 3.15x vs 1.8% delivered)."""

    def block(p, x, bias):
        x = attn(p, _rms(x, p["s1"]), bias) + (x - _rms(x, p["s1"]))  # residual on RAW x
        h = jax.nn.relu(jnp.einsum("bld,df->blf", _rms(x, p["s2"]), p["wi"]))
        return x + jnp.einsum("blf,fd->bld", h, p["wo"])

    return block


def run_block(name, attn):
    key = jax.random.key(0)
    params = make_block_params(key)
    x0 = jax.random.normal(jax.random.key(1), (B, L, D), jnp.bfloat16)
    bias = jax.random.normal(jax.random.key(2), (1, H, L, L), jnp.float32)
    block = make_block(attn)

    def loss(params, x):
        for p in params:
            x = block(p, x, bias)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    out = g(params, x0)
    float(np.asarray(out[0]["q"][0, 0]))
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = g(out_to_params(out, params, i), x0)
    float(np.asarray(out[-1]["o"][-1, -1]))
    dt = (time.perf_counter() - t0) / STEPS
    flops = LAYERS * 3 * (
        4 * 2 * B * L * D * H * DK + 2 * 2 * B * H * L * L * DK
        + 2 * 2 * B * L * D * DFF
    )
    print(f"{name}: {dt * 1e3:7.2f} ms/iter  {flops / dt / 1e12:6.1f} TF/s")
    return dt


if __name__ == "__main__":
    print(f"B={B} L={L} layers={LAYERS} steps={STEPS} "
          f"backend={jax.default_backend()}")
    if os.environ.get("AB_BLOCK", "0") == "1":
        b = run_block("block bhld (head-major)", attn_bhld)
        c = run_block("block bhkl (L-minor)", attn_bhkl)
        d = run_block("block packed (head-pair 128)", attn_packed)
        print(f"block: bhkl vs bhld {b / c:.3f}x | packed vs bhld {b / d:.3f}x")
    else:
        a = run("blhd (legacy)", attn_blhd)
        b = run("bhld (head-major)", attn_bhld)
        c = run("bhkl (L-minor)", attn_bhkl)
        d = run("packed (head-pair 128)", attn_packed)
        print(f"speedup bhld vs blhd: {a / b:.3f}x | bhkl vs bhld: "
              f"{b / c:.3f}x | packed vs bhld: {b / d:.3f}x")
