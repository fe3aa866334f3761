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


if __name__ == "__main__":
    print(f"B={B} L={L} layers={LAYERS} steps={STEPS} "
          f"backend={jax.default_backend()}")
    a = run("blhd (current)", attn_blhd)
    b = run("bhld (head-major)", attn_bhld)
    print(f"speedup bhld vs blhd: {a / b:.3f}x")
