"""Flash v3: fused projection + attention + output-projection kernel.

Third Mosaic generation (docs/flash_v3_design.md; v1/v2 history in
ops/flash.py STATUS). v1/v2 fused only the softmax core and plateaued at
XLA parity because the score/AV GEMMs are <1% of step FLOPs at monoT5
shapes — the measured losses live AROUND the core (round-3 HLO copy
attribution, scripts/dump_copies.py):

- the head-major projection einsum ("bld,dhk->bhlk") runs at ~45% of MXU
  ideal (64-lane minor dim) and XLA relabels its output layout for every
  consumer (~1.7 GB/step of relayout fusions at t5-base L=188);
- the q/k/v activations and the fp32 attention output are residuals: at
  B=32/L=192/t5-base each layer stages ~47 MB per microbatch to HBM in the
  forward and reads it back in the backward.

v3 removes both by fusing the whole attention block per batch row: one
WIDE (L, D) @ (D, 3*H*dk) QKV GEMM (full 128-lane tiles, FFN-like
pipelining) into VMEM scratch, per-head softmax + AV entirely in VMEM,
and the (L, H*dk) @ (H*dk, D) output projection — q/k/v/scores/attention
outputs never touch HBM in either direction. Only the per-head softmax
statistics (m, l) are saved for the backward, which recomputes q/k/v and
the probabilities flash-style inside its own kernel and emits d_qkv
directly in the fused (L, 3*H*dk) layout; the four weight-gradient /
input-gradient GEMMs stay OUTSIDE in XLA (dW GEMMs already run ~88%).

Deliberate differences from the reference's torch/CUDA structure
(old/lce_wrapper.py trains with stock HF attention): this is a
TPU-architecture decision, not a translation — the VMEM capacity of one
v5e core (128 MB) fits the ENTIRE key range, all heads, and all three
weight matrices for L <= 512, so no online-softmax streaming or kv
blocking is needed; the grid is simply (B,) and Mosaic pipelines x-row
fetches against compute while constant-index-map weights are fetched once
per pallas_call.

Scope gate (flash_v3_eligible): self-attention, Lq == Lk <= 512, dk in
{64, 128}, deterministic (no attention-weight dropout), TPU backend.
Decoder self-attention (L ~ label length) and cross-attention stay on the
XLA chunked path — their shapes are too small for kernel launch to pay.

STATUS: stage-1 (forward) / stage-2 (custom VJP) of the go/no-go plan in
docs/flash_v3_design.md; numerically verified against the XLA path in
interpret mode (tests/test_flash_v3.py). Full-step TPU measurement gates
whether T5Config.flash_v3 defaults on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def flash_v3_eligible(H: int, Lq: int, Lk: int, dk: int, d_model: int,
                      *, interpret: bool = False) -> bool:
    """Shape/VMEM gate for the fused block kernel. Conservative: the
    backward keeps pos + dpos (2 * H*L*L fp32) plus both weight operands
    resident; cap the static residents at 64 MB of the ~128 MB VMEM.

    ``interpret=True`` (T5Config.flash_v3_interpret plumb-through) lets the
    gate pass on non-TPU backends so the wiring can be driven end-to-end in
    Pallas interpret mode — an explicit argument, not a module global, so a
    production CPU run can never be silently re-gated by test state."""
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    if Lq != Lk or dk not in (64, 128) or Lq < 64 or Lq > 512:
        return False
    # Estimate with the shapes that actually launch: fused_self_attention
    # pads L up to the bf16 sublane tile (16) before the pallas_call.
    Lp = _round_up(Lq, 16)
    inner = H * dk
    resident = (
        4 * inner * d_model * 2       # wqkv + wo, bf16
        + 2 * H * Lp * Lp * 4         # pos + dpos, fp32
        + 4 * Lp * inner * 4          # qkv/dqkv scratch upper bound
        + Lp * inner * 2              # fwd attn scratch / bwd recomputed attn
    )
    return resident <= 64 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _v3_fwd_kernel(x_ref, wqkv_ref, wo_ref, pos_ref, mask_ref,
                   y_ref, m_ref, l_ref, qkv_scr, attn_scr,
                   *, H: int, dk: int):
    # x (1, L, D); wqkv (D, 3*I) / wo (I, D) resident (constant index
    # maps -> fetched once per pallas_call); pos (H, L, L) fp32 resident;
    # mask (1, 1, L) fp32. I = H*dk.
    inner = H * dk
    x = x_ref[0]  # (L, D)

    # One wide QKV GEMM: K=D, N=3*I (e.g. 768x2304 at t5-base) — full
    # 128-lane tiles, unlike the 64-minor per-head projection einsum.
    qkv_scr[:] = jax.lax.dot_general(
        x, wqkv_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(qkv_scr.dtype)

    mask = mask_ref[0, 0][None, :].astype(jnp.float32)  # (1, L)
    for h in range(H):
        q = qkv_scr[:, h * dk:(h + 1) * dk]                       # (L, dk)
        k = qkv_scr[:, inner + h * dk:inner + (h + 1) * dk]
        v = qkv_scr[:, 2 * inner + h * dk:2 * inner + (h + 1) * dk]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, L)
        s = s + pos_ref[h].astype(jnp.float32) + mask
        m = s.max(axis=1)
        p = jnp.exp(s - m[:, None])
        l = jnp.maximum(p.sum(axis=1), 1e-30)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l[:, None]
        attn_scr[:, h * dk:(h + 1) * dk] = o.astype(attn_scr.dtype)
        m_ref[0, h] = m[:, None]
        l_ref[0, h] = l[:, None]

    y_ref[0] = jax.lax.dot_general(
        attn_scr[:, :], wo_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def v3_forward(x, wqkv, wo, pos3, key_mask, *, interpret=False):
    """x (B, L, D) compute dtype; wqkv (D, 3*I); wo (I, D); pos3 (H, L, L)
    fp32; key_mask (B, L) fp32 additive. -> (y (B, L, D), m, l (B, H, L)
    fp32)."""
    B, L, D = x.shape
    inner = wo.shape[0]
    H = pos3.shape[0]
    dk = inner // H

    y, m, l = pl.pallas_call(
        functools.partial(_v3_fwd_kernel, H=H, dk=dk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * inner), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, L, L), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, 3 * inner), x.dtype),
            pltpu.VMEM((L, inner), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * D * 4 * inner + 4 * B * H * L * L * dk,
            bytes_accessed=(
                (x.size * 2 + wqkv.size + wo.size) * x.dtype.itemsize
                + pos3.size * 4           # fp32 position bias (largest input)
                + 2 * B * H * L * 4 * 2   # m/l outputs
            ),
            transcendentals=B * H * L * L,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, wqkv, wo, pos3.astype(jnp.float32),
        key_mask.astype(jnp.float32)[:, None, :],
    )
    return y, m[..., 0], l[..., 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _v3_bwd_kernel(x_ref, wqkv_ref, pos_ref, mask_ref, m_ref, l_ref,
                   dattn_ref, dqkv_ref, attn_ref, dpos_ref, qkv_scr,
                   *, H: int, dk: int):
    # Recompute qkv and the normalized probabilities from (m, l); emit
    # d_qkv in the fused (L, 3*I) layout plus the recomputed attention
    # outputs (for the dWo GEMM outside — recomputing here costs one AV
    # GEMM but saves the (B, L, I) forward residual write + read).
    # dpos accumulates across the b sweep in its own output ref (constant
    # index map -> consecutive revisits, single final write-back; the
    # pattern v2 validated).
    b = pl.program_id(0)
    inner = H * dk
    x = x_ref[0]
    cdt = x.dtype

    qkv_scr[:] = jax.lax.dot_general(
        x, wqkv_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    mask = mask_ref[0, 0][None, :].astype(jnp.float32)
    for h in range(H):
        q = qkv_scr[:, h * dk:(h + 1) * dk]
        k = qkv_scr[:, inner + h * dk:inner + (h + 1) * dk]
        v = qkv_scr[:, 2 * inner + h * dk:2 * inner + (h + 1) * dk]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + pos_ref[h].astype(jnp.float32) + mask
        p = jnp.exp(s - m_ref[0, h]) / l_ref[0, h]  # (L, L) normalized
        p_c = p.astype(cdt)

        o = jax.lax.dot_general(
            p_c, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, dk) — matches fwd acc/l since p is already normalized
        attn_ref[0, :, h * dk:(h + 1) * dk] = o.astype(cdt)

        g = dattn_ref[0][:, h * dk:(h + 1) * dk].astype(jnp.float32)
        delta = (g * o).sum(axis=1)  # (L,)
        g_c = g.astype(cdt)
        dv = jax.lax.dot_general(
            p_c, g_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, dk)
        dp = jax.lax.dot_general(
            g_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, L)
        ds = p * (dp - delta[:, None])
        ds_c = ds.astype(cdt)
        dq = jax.lax.dot_general(
            ds_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkk = jax.lax.dot_general(
            ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, h * dk:(h + 1) * dk] = dq.astype(cdt)
        dqkv_ref[0, :, inner + h * dk:inner + (h + 1) * dk] = dkk.astype(cdt)
        dqkv_ref[0, :, 2 * inner + h * dk:2 * inner + (h + 1) * dk] = (
            dv.astype(cdt)
        )

        @pl.when(b == 0)
        def _init_pos():
            dpos_ref[h] = ds

        @pl.when(b != 0)
        def _acc_pos():
            dpos_ref[h] += ds


def v3_backward(x, wqkv, pos3, key_mask, m, l, d_attn, *, interpret=False):
    """-> (d_qkv (B, L, 3*I) compute dtype, attn (B, L, I) recomputed,
    dpos (H, L, L) fp32). The dx / dW GEMMs happen outside in XLA."""
    B, L, D = x.shape
    H = pos3.shape[0]
    inner = d_attn.shape[-1]
    dk = inner // H

    dqkv, attn, dpos = pl.pallas_call(
        functools.partial(_v3_bwd_kernel, H=H, dk=dk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * inner), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, L, L), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, inner), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, 3 * inner), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, inner), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, L, L), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, 3 * inner), x.dtype),
            jax.ShapeDtypeStruct((B, L, inner), x.dtype),
            jax.ShapeDtypeStruct((H, L, L), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, 3 * inner), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * D * 3 * inner + 12 * B * H * L * L * dk,
            bytes_accessed=(
                (x.size * 2 + wqkv.size + d_attn.size * 3)
                * x.dtype.itemsize
                + 2 * pos3.size * 4       # fp32 pos input + dpos output
                + 2 * B * H * L * 4 * 2   # m/l inputs
            ),
            transcendentals=B * H * L * L,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, wqkv, pos3.astype(jnp.float32),
        key_mask.astype(jnp.float32)[:, None, :],
        m[..., None], l[..., None], d_attn,
    )
    return dqkv, attn, dpos


# ---------------------------------------------------------------------------
# custom-VJP wrapper (padded shapes; padding/slicing live outside)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _v3_core(interpret, x, wqkv, wo, pos3, key_mask):
    y, _, _ = v3_forward(x, wqkv, wo, pos3, key_mask, interpret=interpret)
    return y


def _v3_core_fwd(interpret, x, wqkv, wo, pos3, key_mask):
    y, m, l = v3_forward(x, wqkv, wo, pos3, key_mask, interpret=interpret)
    return y, (x, wqkv, wo, pos3, key_mask, m, l)


def _v3_core_bwd(interpret, res, dy):
    x, wqkv, wo, pos3, key_mask, m, l = res
    dt = x.dtype
    # d_attn = dy @ wo^T; dWo from the RECOMPUTED attention outputs the
    # backward kernel emits, so the forward never writes them to HBM.
    # NOT bit-identical to the forward's: the forward casts the
    # UNNORMALIZED probabilities to bf16 and divides the PV product by l
    # afterwards, the backward normalizes first then casts — the
    # recomputed o differs by up to ~1 bf16 ulp per element, i.e. dWo is
    # exact for an o within rounding noise of the one that produced y
    # (flash-standard recompute error class; bounded by the grad parity
    # tests' tolerances).
    d_attn = jnp.einsum(
        "bld,id->bli", dy, wo, preferred_element_type=jnp.float32
    ).astype(dt)
    dqkv, attn, dpos = v3_backward(
        x, wqkv, pos3, key_mask, m, l, d_attn, interpret=interpret
    )
    dwo = jnp.einsum(
        "bli,bld->id", attn, dy, preferred_element_type=jnp.float32
    ).astype(wo.dtype)
    dwqkv = jnp.einsum(
        "bld,blt->dt", x, dqkv, preferred_element_type=jnp.float32
    ).astype(wqkv.dtype)
    dx = jnp.einsum(
        "blt,dt->bld", dqkv, wqkv, preferred_element_type=jnp.float32
    ).astype(dt)
    # the additive key mask is derived from integer attention masks
    # everywhere in this codebase (same stance as v1/v2): no gradient.
    return dx, dwqkv, dwo, dpos.astype(pos3.dtype), jnp.zeros_like(key_mask)


_v3_core.defvjp(_v3_core_fwd, _v3_core_bwd)


def fused_self_attention(x, wqkv, wo, pos3, key_mask, *, interpret=None):
    """Fused self-attention block: y = attn(x W_qkv) W_o, differentiable.

    x (B, L, D) compute dtype; wqkv (D, 3*H*dk) pre-fused q|k|v weight
    (t5.fuse_attention_params layout); wo (H*dk, D); pos3 (H, L, L) fp32
    position bias; key_mask (B, L) fp32 additive (0 real / NEG_INF pad).

    Pads L to a multiple of 16 internally (bf16 sublane tile); padded key
    columns are masked NEG_INF, padded query rows are sliced away (their
    cotangents are zero, so all padded gradients vanish — see
    tests/test_flash_v3.py::test_padded_length_grads).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, D = x.shape
    Lp = _round_up(L, 16)
    if Lp != L:
        pad = Lp - L
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        pos3 = jnp.pad(pos3, ((0, 0), (0, pad), (0, pad)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)),
                           constant_values=NEG_INF)
    y = _v3_core(bool(interpret), x, wqkv, wo, pos3, key_mask)
    return y[:, :L] if Lp != L else y
