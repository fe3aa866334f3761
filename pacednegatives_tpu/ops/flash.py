"""Fused flash-attention forward kernel (Pallas/Mosaic).

T5-style attention (no 1/sqrt(dk) scaling) with additive biases, computed
blockwise in VMEM: for each (batch, head, query-block) the kernel streams
key/value blocks, keeps online-softmax statistics (m, l) and the output
accumulator in scratch, and never materializes (B, H, Lq, Lk) scores in HBM.

Grid: (B, H, n_q_blocks, n_kv_blocks) — Mosaic iterates the last dimension
innermost, so scratch persists across the kv sweep for one (b, h, qi) cell;
the first kv step initializes the accumulators and the last one writes the
normalized output plus the (m, l) statistics (which make the XLA flash
backward in models/t5.py reusable as this kernel's VJP).

Bias decomposition matches models/t5.py: a head-shared position bias
(H, Lq, Lk) and a per-batch key mask (B, Lk), combined per block in VMEM.

STATUS: experimental. Numerically verified against dense attention
(interpret and compiled on v5e), but NOT wired into the model: at monoT5
shapes (dk=64, L<=512) XLA's fused dense attention outperforms this kernel
on v5e, and the training memory problem is already solved by the exact
chunked-attention path with its flash-style custom VJP (models/t5.py).
Retained as the starting point for a tuned Mosaic implementation (ROADMAP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_fwd_kernel(
    q_ref,      # (1, 1, q_blk, dk)
    k_ref,      # (1, 1, kv_blk, dk)
    v_ref,      # (1, 1, kv_blk, dk)
    pos_ref,    # (1, q_blk, kv_blk)   head-shared bias
    mask_ref,   # (1, 1, kv_blk)       per-batch additive key mask
    out_ref,    # (1, 1, q_blk, dk)
    m_ref,      # (1, 1, q_blk, 1)
    l_ref,      # (1, 1, q_blk, 1)
    acc_ref,    # scratch (q_blk, dk) fp32
    m_scr,      # scratch (q_blk,) fp32
    l_scr,      # scratch (q_blk,) fp32
):
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0]  # (q_blk, dk)
    k = k_ref[0, 0]  # (kv_blk, dk)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (q_blk, kv_blk)
    s = s + pos_ref[0].astype(jnp.float32) + mask_ref[0, 0][None, :].astype(jnp.float32)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=1))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])
    l_scr[:] = l_scr[:] * corr + p.sum(axis=1)
    acc_ref[:] = acc_ref[:] * corr[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(ki == n_kv - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0, 0] = (acc_ref[:] / l[:, None]).astype(out_ref.dtype)
        m_ref[0, 0] = m_scr[:][:, None]
        l_ref[0, 0] = l[:, None]


def flash_attention_forward(
    q: jax.Array,        # (B, H, Lq, dk)
    k: jax.Array,        # (B, H, Lk, dk)
    v: jax.Array,        # (B, H, Lk, dk)
    pos_bias: jax.Array,  # (H, Lq, Lk) fp32 (head-shared)
    key_mask: jax.Array,  # (B, Lk) fp32 additive
    q_block: int = 128,
    kv_block: int = 128,
    interpret: bool = False,
):
    """-> (out (B, H, Lq, dk), m (B, H, Lq), l (B, H, Lq)).

    Lq must be a multiple of q_block and Lk of kv_block (pad keys with
    key_mask = NEG_INF; pad queries freely — their outputs are discarded).
    """
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    q_block = min(q_block, Lq)
    kv_block = min(kv_block, Lk)
    if Lq % q_block or Lk % kv_block:
        raise ValueError(
            f"Lq={Lq} / Lk={Lk} must be multiples of block sizes "
            f"({q_block}, {kv_block})"
        )
    grid = (B, H, Lq // q_block, Lk // kv_block)

    out, m, l = pl.pallas_call(
        _flash_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dk), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, kv_block), lambda b, h, qi, ki: (h, qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block), lambda b, h, qi, ki: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, q_block, dk), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_block, 1), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_block, 1), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, dk), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_block, dk), jnp.float32),
            pltpu.VMEM((q_block,), jnp.float32),
            pltpu.VMEM((q_block,), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * dk,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(
        q, k, v, pos_bias.astype(jnp.float32),
        key_mask.astype(jnp.float32)[:, None, :],
    )
    return out, m[..., 0], l[..., 0]


def flash_attention_reference(q, k, v, pos_bias, key_mask):
    """Dense XLA reference for parity tests: same inputs/layout."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s + pos_bias[None].astype(jnp.float32) + key_mask[:, None, None, :].astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
