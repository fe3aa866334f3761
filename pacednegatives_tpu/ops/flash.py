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

STATUS: functional but opt-in (T5Config.flash_kernel=False). Two
generations, both numerically verified against the XLA flash path
(interpret-mode parity tests incl. the learned position-bias gradient) and
wired into models/t5._flash_core behind the flag:
- v1 (grid (B, H, qi, ki)): ~221k tiny grid cells per t5-base L=512 train
  step; Mosaic per-iteration overhead dominates (1.52 vs 2.29 steps/s).
- v2 (grid (B, qi), whole keys + all heads VMEM-resident, unrolled head
  loop, single fused backward producing dq/dk/dv/dpos): 2.27 steps/s at
  q_block=512 — parity with the XLA chunked path (2.29) but not beyond;
  the remaining gap is the K=dk=64 contractions running at half MXU lane
  occupancy, which XLA's batched einsums pipeline just as well.
The flag therefore stays off by default; the XLA chunked custom-VJP path
in models/t5.py (single-chunk fast path + bf16 backward operands) is the
production implementation at monoT5 shapes.
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
    out_dtype=None,  # default q.dtype; fp32 when out feeds a flash VJP
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
            jax.ShapeDtypeStruct((B, H, Lq, dk), out_dtype or q.dtype),
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


# ---------------------------------------------------------------------------
# Fused flash backward (Mosaic): dq + dpos in kernel 1, dk + dv in kernel 2.
#
# Accumulation strategy (grid iterates the LAST dim innermost):
# - dq / dk / dv accumulate in a (B, blk, dk) fp32 SCRATCH, which persists
#   across the whole grid sweep; each output block is written exactly once,
#   on its final visit (ki/qi == last for that b). No output block is ever
#   read-modify-written across non-consecutive visits.
# - dpos (head-shared position-bias grad — a LEARNED parameter in T5, so
#   it cannot be dropped) accumulates directly in its output ref: its block
#   (h, qi, ki) is constant over the innermost b sweep, so revisits are
#   consecutive and Mosaic keeps the block in VMEM; initialized at b == 0,
#   written back when the outer indices advance.
# - the per-batch additive key mask gets NO gradient from this path (it is
#   derived from integer attention masks everywhere in this codebase); the
#   XLA backward in models/t5.py remains the general path.
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref,     # (1, 1, q_blk, dk)
    k_ref,     # (1, 1, kv_blk, dk)
    v_ref,     # (1, 1, kv_blk, dk)
    pos_ref,   # (1, q_blk, kv_blk)
    mask_ref,  # (1, 1, kv_blk)
    m_ref,     # (1, 1, q_blk, 1)
    l_ref,     # (1, 1, q_blk, 1)
    dcap_ref,  # (1, 1, q_blk, 1)   D_i = sum_d g*out
    g_ref,     # (1, 1, q_blk, dk)  fp32
    dq_ref,    # out (1, 1, q_blk, dk) fp32 — written at ki == last
    dpos_ref,  # out (1, q_blk, kv_blk) fp32 — accum over b (innermost)
    dq_scr,    # scratch (B, q_blk, dk) fp32 — accum over ki
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    b = pl.program_id(3)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + pos_ref[0].astype(jnp.float32) + mask_ref[0, 0][None, :].astype(jnp.float32)
    p = jnp.exp(s - m_ref[0, 0]) / l_ref[0, 0]  # (q_blk, kv_blk)
    g = g_ref[0, 0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcap_ref[0, 0])  # (q_blk, kv_blk)
    dq_i = jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == 0)
    def _init_dq():
        dq_scr[b] = dq_i

    @pl.when(ki != 0)
    def _acc_dq():
        dq_scr[b] += dq_i

    @pl.when(ki == n_k - 1)
    def _emit_dq():
        dq_ref[0, 0] = dq_scr[b]

    @pl.when(b == 0)
    def _init_dpos():
        dpos_ref[0] = ds

    @pl.when(b != 0)
    def _acc_dpos():
        dpos_ref[0] += ds


def _bwd_dkv_kernel(
    q_ref,     # (1, 1, q_blk, dk)
    k_ref,     # (1, 1, kv_blk, dk)
    v_ref,     # (1, 1, kv_blk, dk)
    pos_ref,   # (1, q_blk, kv_blk)
    mask_ref,  # (1, 1, kv_blk)
    m_ref,     # (1, 1, q_blk, 1)
    l_ref,     # (1, 1, q_blk, 1)
    dcap_ref,  # (1, 1, q_blk, 1)
    g_ref,     # (1, 1, q_blk, dk) fp32
    dk_ref,    # out (1, 1, kv_blk, dk) fp32 — written at qi == last
    dv_ref,    # out (1, 1, kv_blk, dk) fp32 — written at qi == last
    dk_scr,    # scratch (B, kv_blk, dk) fp32 — accum over qi
    dv_scr,    # scratch (B, kv_blk, dk) fp32 — accum over qi
):
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    b = pl.program_id(3)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + pos_ref[0].astype(jnp.float32) + mask_ref[0, 0][None, :].astype(jnp.float32)
    p = jnp.exp(s - m_ref[0, 0]) / l_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)
    dv_i = jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (kv_blk, dk)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcap_ref[0, 0])
    dk_i = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (kv_blk, dk)

    @pl.when(qi == 0)
    def _init():
        dk_scr[b] = dk_i
        dv_scr[b] = dv_i

    @pl.when(qi != 0)
    def _acc():
        dk_scr[b] += dk_i
        dv_scr[b] += dv_i

    @pl.when(qi == n_q - 1)
    def _emit():
        dk_ref[0, 0] = dk_scr[b]
        dv_ref[0, 0] = dv_scr[b]


def flash_attention_backward(
    q: jax.Array,        # (B, H, Lq, dk)
    k: jax.Array,        # (B, H, Lk, dk)
    v: jax.Array,        # (B, H, Lk, dk)
    pos_bias: jax.Array,  # (H, Lq, Lk) fp32
    key_mask: jax.Array,  # (B, Lk) fp32 additive
    m: jax.Array,        # (B, H, Lq) fp32 softmax row max
    l: jax.Array,        # (B, H, Lq) fp32 softmax row sum
    dcap: jax.Array,     # (B, H, Lq) fp32 D_i = sum_d g*out
    g: jax.Array,        # (B, H, Lq, dk) fp32 upstream grad
    q_block: int = 128,
    kv_block: int = 128,
    interpret: bool = False,
):
    """-> (dq, dk, dv (B, H, L*, dk) fp32, dpos (H, Lq, Lk) fp32).

    Scores/probabilities live only in VMEM: the backward streams the same
    tiles as the forward and never materializes a (B, H, Lq, Lk) tensor in
    HBM — at t5-base L=512 the XLA chunked backward moves multi-GB fp32
    score transients per step; this kernel moves none.
    """
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    q_block = min(q_block, Lq)
    kv_block = min(kv_block, Lk)
    if Lq % q_block or Lk % kv_block:
        raise ValueError(f"Lq={Lq}/Lk={Lk} vs blocks ({q_block},{kv_block})")
    nq, nk = Lq // q_block, Lk // kv_block

    m4, l4, d4 = m[..., None], l[..., None], dcap[..., None]
    pos = pos_bias.astype(jnp.float32)
    msk = key_mask.astype(jnp.float32)[:, None, :]
    g = g.astype(jnp.float32)

    stats = lambda im: pl.BlockSpec((1, 1, q_block, 1), im,
                                    memory_space=pltpu.VMEM)

    dq, dpos = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(H, nq, nk, B),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dk), lambda h, qi, ki, b: (b, h, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, qi, ki, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, qi, ki, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, kv_block), lambda h, qi, ki, b: (h, qi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block), lambda h, qi, ki, b: (b, 0, ki), memory_space=pltpu.VMEM),
            stats(lambda h, qi, ki, b: (b, h, qi, 0)),
            stats(lambda h, qi, ki, b: (b, h, qi, 0)),
            stats(lambda h, qi, ki, b: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, q_block, dk), lambda h, qi, ki, b: (b, h, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, q_block, dk), lambda h, qi, ki, b: (b, h, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, kv_block), lambda h, qi, ki, b: (h, qi, ki), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, dk), jnp.float32),
            jax.ShapeDtypeStruct((H, Lq, Lk), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, q_block, dk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Lq * Lk * dk,
            bytes_accessed=(q.size + k.size + v.size + g.size) * 4,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v, pos, msk, m4, l4, d4, g)

    dk_, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(H, nk, nq, B),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dk), lambda h, ki, qi, b: (b, h, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, ki, qi, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, ki, qi, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, kv_block), lambda h, ki, qi, b: (h, qi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block), lambda h, ki, qi, b: (b, 0, ki), memory_space=pltpu.VMEM),
            stats(lambda h, ki, qi, b: (b, h, qi, 0)),
            stats(lambda h, ki, qi, b: (b, h, qi, 0)),
            stats(lambda h, ki, qi, b: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, q_block, dk), lambda h, ki, qi, b: (b, h, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, ki, qi, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_block, dk), lambda h, ki, qi, b: (b, h, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lk, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lk, dk), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, kv_block, dk), jnp.float32),
            pltpu.VMEM((B, kv_block, dk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Lq * Lk * dk,
            bytes_accessed=(q.size + k.size + v.size + g.size) * 4,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v, pos, msk, m4, l4, d4, g)
    return dq, dk_, dv, dpos


# ---------------------------------------------------------------------------
# Flash v2: coarse-grained kernels for moderate key lengths.
#
# v1's grid iterates (B, H, qi, ki) — at t5-base L=512 that is ~221k grid
# cells per train step across fwd+bwd, each doing ~8 MFLOP: Mosaic's
# per-iteration overhead dominates (measured 1.52 vs 2.18 steps/s). v2
# keys the grid on (B, q_block) only: the ENTIRE key range and ALL heads
# for one batch row live in VMEM (t5-base L=512: k+v ~1.6 MB, position
# bias 12.6 MB), the head loop is unrolled in the kernel body, and one
# backward kernel produces dq, dk, dv AND dpos:
#   - dq: written once per (b, qi) cell (keys fully resident — the kv
#     reduction happens inside the cell);
#   - dk/dv: accumulate in their output refs over qi, the INNERMOST grid
#     dim — consecutive revisits, so Mosaic keeps the block in VMEM and
#     writes it back once per b;
#   - dpos: whole-array output block with a CONSTANT index map —
#     revisited on every iteration (always consecutive), accumulated in
#     place, written back once at the end of the sweep.
# Eligible when Lq, Lk are 128-aligned and the VMEM residents fit
# (flash_v2_eligible); longer sequences fall back to the XLA chunked path.
# ---------------------------------------------------------------------------


def flash_v2_eligible(H: int, Lq: int, Lk: int, dk: int) -> bool:
    resident = H * Lk * dk * 2 * 2 + 2 * H * Lq * Lk * 4  # k+v, pos+dpos
    return (
        Lq % 128 == 0 and Lk % 128 == 0 and dk in (64, 128)
        and resident <= 48 * 1024 * 1024
    )


def _fwd_v2_kernel(q_ref, k_ref, v_ref, pos_ref, mask_ref,
                   out_ref, m_ref, l_ref, *, H: int):
    # q (1, H, q_blk, dk); k/v (1, H, Lk, dk) whole keys; pos (H, Lq, Lk)
    # WHOLE array (constant index map -> fetched once per pallas_call, not
    # per grid cell); mask (1, 1, Lk)
    qi = pl.program_id(1)
    qb = q_ref.shape[2]
    rows = pl.ds(qi * qb, qb)
    mask = mask_ref[0, 0][None, :].astype(jnp.float32)
    for h in range(H):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_blk, Lk)
        s = s + pos_ref[h, rows].astype(jnp.float32) + mask
        m = s.max(axis=1)
        p = jnp.exp(s - m[:, None])
        l = jnp.maximum(p.sum(axis=1), 1e-30)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, h] = (acc / l[:, None]).astype(out_ref.dtype)
        m_ref[0, h] = m[:, None]
        l_ref[0, h] = l[:, None]


def flash_attention_forward_v2(
    q: jax.Array,        # (B, H, Lq, dk)
    k: jax.Array,        # (B, H, Lk, dk)
    v: jax.Array,        # (B, H, Lk, dk)
    pos_bias: jax.Array,  # (H, Lq, Lk) fp32
    key_mask: jax.Array,  # (B, Lk) fp32 additive
    q_block: int = 128,
    interpret: bool = False,
    out_dtype=None,
):
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    q_block = min(q_block, Lq)
    if Lq % q_block:
        raise ValueError(f"Lq={Lq} not a multiple of q_block={q_block}")
    nq = Lq // q_block
    import functools

    out, m, l = pl.pallas_call(
        functools.partial(_fwd_v2_kernel, H=H),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, H, q_block, dk), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Lq, Lk), lambda b, qi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), lambda b, qi: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, q_block, dk), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, 1), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, 1), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, dk), out_dtype or q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * dk,
            bytes_accessed=(q.size + B * 2 * H * Lk * dk) * 2,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        q, k, v, pos_bias.astype(jnp.float32),
        key_mask.astype(jnp.float32)[:, None, :],
    )
    return out, m[..., 0], l[..., 0]


def _bwd_v2_kernel(q_ref, k_ref, v_ref, pos_ref, mask_ref, m_ref, l_ref,
                   dcap_ref, g_ref, dq_ref, dk_ref, dv_ref, dpos_ref,
                   *, H: int):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    qb = q_ref.shape[2]
    rows = pl.ds(qi * qb, qb)

    mask = mask_ref[0, 0][None, :].astype(jnp.float32)
    cdt = q_ref.dtype

    for h in range(H):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + pos_ref[h, rows].astype(jnp.float32) + mask
        p = jnp.exp(s - m_ref[0, h]) / l_ref[0, h]  # (q_blk, Lk)
        g = g_ref[0, h].astype(jnp.float32)
        p_c = p.astype(cdt)
        g_c = g.astype(cdt)
        dv_i = jax.lax.dot_general(
            p_c, g_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lk, dk)
        dp = jax.lax.dot_general(
            g_c, v_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_blk, Lk)
        ds = p * (dp - dcap_ref[0, h])
        ds_c = ds.astype(cdt)
        dq_ref[0, h] = jax.lax.dot_general(
            ds_c, k_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_i = jax.lax.dot_general(
            ds_c, q_ref[0, h],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lk, dk)

        @pl.when(qi == 0)
        def _init_kv():
            dk_ref[0, h] = dk_i
            dv_ref[0, h] = dv_i

        @pl.when(qi != 0)
        def _acc_kv():
            dk_ref[0, h] += dk_i
            dv_ref[0, h] += dv_i

        # dpos region (h, rows) is first visited at b == 0 (qi sweeps
        # fully for each b), accumulated for b > 0
        @pl.when(b == 0)
        def _init_pos():
            dpos_ref[h, rows] = ds

        @pl.when(b != 0)
        def _acc_pos():
            dpos_ref[h, rows] += ds


def flash_attention_backward_v2(
    q, k, v, pos_bias, key_mask, m, l, dcap, g,
    q_block: int = 128,
    interpret: bool = False,
):
    """-> (dq, dk, dv (B, H, L*, dk) fp32, dpos (H, Lq, Lk) fp32)."""
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    q_block = min(q_block, Lq)
    if Lq % q_block:
        raise ValueError(f"Lq={Lq} not a multiple of q_block={q_block}")
    nq = Lq // q_block
    import functools

    m4, l4, d4 = m[..., None], l[..., None], dcap[..., None]
    dq, dk_, dv, dpos = pl.pallas_call(
        functools.partial(_bwd_v2_kernel, H=H),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, H, q_block, dk), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            # whole pos resident (constant index map): fetched once per
            # pallas_call, indexed by dynamic row slice in the kernel
            pl.BlockSpec((H, Lq, Lk), lambda b, qi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), lambda b, qi: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, 1), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, 1), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, 1), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, q_block, dk), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, q_block, dk), lambda b, qi: (b, 0, qi, 0), memory_space=pltpu.VMEM),
            # dk/dv: innermost-dim (qi) revisits are consecutive -> in-ref
            # accumulation, one write-back per b
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, dk), lambda b, qi: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            # dpos: constant index map -> always-consecutive revisits,
            # accumulated across the whole sweep, single final write-back
            pl.BlockSpec((H, Lq, Lk), lambda b, qi: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lk, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lk, dk), jnp.float32),
            jax.ShapeDtypeStruct((H, Lq, Lk), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Lq * Lk * dk,
            bytes_accessed=(q.size + g.size) * 4 + B * nq * 2 * H * Lk * dk * 2,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        q, k, v, pos_bias.astype(jnp.float32),
        key_mask.astype(jnp.float32)[:, None, :], m4, l4, d4,
        g.astype(jnp.float32),
    )
    return dq, dk_, dv, dpos
