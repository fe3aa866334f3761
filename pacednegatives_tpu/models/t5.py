"""From-scratch T5 encoder-decoder in pure-functional JAX.

Replaces the reference's external ``transformers.T5ForConditionalGeneration``
dependency (reference: pacednegatives/lceT5.py:5, distill/wrapper.py:4) with a
TPU-first implementation:

- params are a plain nested-dict pytree (shardable via parallel.param_shardings)
- activations in a configurable compute dtype (bfloat16 on TPU), layernorm and
  softmax in fp32, matmuls with ``preferred_element_type=float32`` so the MXU
  accumulates in fp32
- everything is jit/pjit-traceable with static shapes; no Python control flow
  on traced values

Architecture parity targets the classic T5 v1.0 ("t5-small"/"t5-base"):
RMS layer norm without mean subtraction or bias, *unscaled* dot-product
attention (the 1/sqrt(d_k) is folded into init), shared relative-position
bucket bias computed once per stack, ReLU feed-forward, tied embeddings with
d_model**-0.5 logit scaling. Verified numerically against a torch
T5ForConditionalGeneration in tests/test_t5_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

NEG_INF = -1e9  # additive mask value, applied in fp32


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    num_decoder_layers: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = True
    gated_ffn: bool = False  # False = T5 v1.0 ReLU FFN, True = v1.1 gated-GELU
    pad_token_id: int = 0
    decoder_start_token_id: int = 0
    dtype: Any = jnp.float32  # compute dtype for activations
    remat: bool = False  # per-block rematerialization (trade FLOPs for HBM)
    # remat policy: "full" recomputes everything; "dots" saves MXU outputs
    # and recomputes only cheap VPU ops (jax.checkpoint_policies.dots_saveable)
    remat_policy: str = "full"
    # attention_impl: "dense" materializes (B, H, Lq, Lk) scores; "chunked"
    # is exact online-softmax over key chunks of attention_chunk — transient
    # memory O(B*H*Lq*chunk), for long-sequence configs the dense form
    # cannot fit (see docs/design.md)
    attention_impl: str = "dense"
    attention_chunk: int = 128
    # flash_kernel: with attention_impl="chunked", run eligible shapes
    # (128-aligned lengths, dk 64/128, TPU) through the fused Mosaic
    # kernels in ops/flash.py (v2: fwd + full bwd; scores never touch
    # HBM). Measured AT PARITY with the XLA chunked path on v5e at monoT5
    # shapes (2.27 vs 2.29 steps/s, t5-base L=512) — off by default; see
    # ops/flash.py STATUS.
    flash_kernel: bool = False
    flash_q_block: int = 128  # v2 query-block rows (512 best at L=512)
    # scan_layers: lax.scan over the (homogeneous) blocks instead of a
    # Python loop — the block body compiles ONCE, cutting t5-base compile
    # time by an order of magnitude. Param layout is unchanged (blocks are
    # stacked inside the trace; XLA elides the copies where layouts allow).
    scan_layers: bool = False
    # fused_qkv: project q|k|v (self) / k|v (cross) in one wide GEMM.
    # MEASURED SLOWER on v5e at monoT5 shapes in BOTH variants: use-site
    # weight concat 6.56 vs 6.99 steps/s (round 2), and the hoisted
    # once-per-step concat via fuse_attention_params + grad re-split
    # 6.85 vs 7.30 (round 3) — the extra dqkv concat/split traffic in the
    # backward outweighs the wider-GEMM pipelining. Default off; kept as a
    # correctness-tested flag for other shapes/hardware
    # (tests/test_microbatch.py::test_fused_qkv_hoisted_matches_unfused).
    fused_qkv: bool = False
    # packed_heads: compute attention for HEAD PAIRS as one dense GEMM by
    # concatenating two heads' q along dk (contraction 64 -> 128) against
    # BLOCK-DIAGONAL K'/V', softmax per head block. REJECTED on v5e:
    # (a) at the XLA graph level the block-diag construction lowers to
    # pathological data-formatting/broadcast ops (2.82 vs 7.30 steps/s at
    # L=188, t5-base), and (b) the packing is not free anyway — the MXU
    # multiplies the structural zero blocks, doubling QK/AV MACs, so the
    # occupancy gain is a wash by construction. Kept as a tested
    # correctness path (tests/test_chunked_attention.py) and a record of
    # the negative result; see also ops/flash.py STATUS for the kernel-
    # level history of the same idea.
    packed_heads: bool = False
    # packed_lanes: project q/k/v for HEAD PAIRS as (B, H/2, L, 2*dk) so the
    # projection/output GEMMs have a 128-wide minor dim (full MXU lanes vs
    # 50% at dk=64); scores/AV unpack the pair via a free minor-dim reshape
    # into an extra batch axis — zero extra FLOPs, unlike packed_heads'
    # block-diagonal construction. Single-key-chunk, no-dropout paths only;
    # falls back to the chunked path otherwise. REJECTED on the full step
    # (6.67 vs 7.42 steps/s at L=188, t5-base): isolated-stack wins
    # (1.6-2.3x, scripts/attn_layout_bench.py) did not transfer — the plain
    # autodiff core re-saves fp32 probability residuals the single-chunk
    # custom VJP avoids, and the 5-D batched einsums lower worse in the
    # full graph. Kept as a tested correctness path and negative result.
    packed_lanes: bool = False
    # flash_v3: route encoder-shaped self-attention (Lq == Lk <= 512,
    # dk 64/128, deterministic) through the fused projection+attention+
    # output-projection Mosaic kernel (ops/flash_v3.py): one wide QKV GEMM
    # in VMEM (full 128-lane tiles vs ~45% MXU at the 64-minor per-head
    # einsum), per-head softmax core and output projection without q/k/v/
    # scores/attention-outputs ever touching HBM, and a backward kernel
    # that recomputes them from the saved (m, l) statistics. Independent
    # of flash_kernel (v1/v2, which fuse only the softmax core). Best run
    # with fused_qkv=True so the weight concat is hoisted once per step.
    # See docs/flash_v3_design.md for the go/no-go measurement plan.
    flash_v3: bool = False
    # Run the flash_v3 pallas_call in interpret mode and let its
    # eligibility gate pass on non-TPU backends — tests drive the full
    # wiring on CPU with this; production code never sets it. Explicit
    # config plumb-through (no monkeypatched module globals): on a TPU a
    # requested-but-ineligible shape warns loudly instead of silently
    # falling back (see attention()).
    flash_v3_interpret: bool = False
    # Dtype for the chunked-attention custom-VJP residual out_bhqd
    # (B, H, Lq, dk): it feeds ONLY D = sum(g * out) in the backward, so
    # "bf16" halves its fwd->bwd HBM staging (the r3 HLO copy attribution
    # charged ~0.65 GB/step of copy traffic to this residual at t5-base
    # B=16 n=7 L=188, remat off) at the cost of bf16 rounding in D — the
    # same rounding class as the bf16 matmul operands used everywhere else.
    # "fp32" (default) is bit-identical to the established numerics.
    attn_residual_dtype: str = "fp32"
    # Custom VJP for the ReLU FFN that saves ONLY the post-ReLU hidden
    # (B, L, d_ff): the ReLU mask is recovered as h > 0 (identical to
    # s > 0 for s != 0; at s == 0 both derivatives are 0), where plain
    # autodiff's residual set includes the pre-ReLU product as well —
    # the r3 HLO attribution charged 0.8 GB/step of FFN hidden staging.
    # Same einsum order/dtypes as autodiff, so gradients are bit-close.
    # Non-gated (v1.0 ReLU) FFN only; ignored for gated_ffn.
    ffn_custom_vjp: bool = False

    @staticmethod
    def small() -> "T5Config":
        return T5Config()

    @staticmethod
    def base() -> "T5Config":
        return T5Config(
            d_model=768, d_ff=3072, num_heads=12,
            num_layers=12, num_decoder_layers=12,
        )

    @staticmethod
    def tiny(vocab_size: int = 512) -> "T5Config":
        """Test-sized config; keeps dims MXU-tileable where possible."""
        return T5Config(
            vocab_size=vocab_size, d_model=64, d_kv=16, d_ff=128,
            num_heads=4, num_layers=2, num_decoder_layers=2,
        )

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _normal(key, shape, std):
    return (jax.random.normal(key, shape) * std).astype(jnp.float32)


def _init_attention(key, cfg: T5Config, has_rel_bias: bool):
    d, inner = cfg.d_model, cfg.inner_dim
    ks = jax.random.split(key, 5)
    # T5 init: q uses std (d * d_kv)^-0.5, k/v use d^-0.5, o uses inner^-0.5 —
    # this is where the missing 1/sqrt(d_k) attention scaling lives.
    p = {
        "q": _normal(ks[0], (d, inner), (d * cfg.d_kv) ** -0.5),
        "k": _normal(ks[1], (d, inner), d**-0.5),
        "v": _normal(ks[2], (d, inner), d**-0.5),
        "o": _normal(ks[3], (inner, d), inner**-0.5),
    }
    if has_rel_bias:
        p["rel_bias"] = _normal(
            ks[4],
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            d**-0.5,
        )
    return p


def _init_mlp(key, cfg: T5Config):
    d, ff = cfg.d_model, cfg.d_ff
    ks = jax.random.split(key, 3)
    if cfg.gated_ffn:
        return {
            "wi_0": _normal(ks[0], (d, ff), d**-0.5),
            "wi_1": _normal(ks[1], (d, ff), d**-0.5),
            "wo": _normal(ks[2], (ff, d), ff**-0.5),
        }
    return {
        "wi": _normal(ks[0], (d, ff), d**-0.5),
        "wo": _normal(ks[1], (ff, d), ff**-0.5),
    }


def init_params(key: jax.Array, cfg: T5Config) -> PyTree:
    """Random-init a full encoder-decoder parameter pytree."""
    n_enc, n_dec = cfg.num_layers, cfg.num_decoder_layers
    keys = iter(jax.random.split(key, 3 + 2 * n_enc + 3 * n_dec + 2))

    def ones():
        # fresh buffer per scale: shared buffers break jit argument donation
        return jnp.ones((cfg.d_model,), jnp.float32)

    encoder = {}
    for i in range(n_enc):
        encoder[f"block_{i}"] = {
            "self_attn": _init_attention(next(keys), cfg, has_rel_bias=(i == 0)),
            "ln_self": {"scale": ones()},
            "mlp": _init_mlp(next(keys), cfg),
            "ln_mlp": {"scale": ones()},
        }
    encoder["final_ln"] = {"scale": ones()}

    decoder = {}
    for i in range(n_dec):
        decoder[f"block_{i}"] = {
            "self_attn": _init_attention(next(keys), cfg, has_rel_bias=(i == 0)),
            "ln_self": {"scale": ones()},
            "cross_attn": _init_attention(next(keys), cfg, has_rel_bias=False),
            "ln_cross": {"scale": ones()},
            "mlp": _init_mlp(next(keys), cfg),
            "ln_mlp": {"scale": ones()},
        }
    decoder["final_ln"] = {"scale": ones()}

    params = {
        "shared": {"embedding": _normal(next(keys), (cfg.vocab_size, cfg.d_model), 1.0)},
        "encoder": encoder,
        "decoder": decoder,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "embedding": _normal(next(keys), (cfg.vocab_size, cfg.d_model), cfg.d_model**-0.5)
        }
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _remat_policy(cfg: "T5Config"):
    if cfg.remat_policy == "dots":
        # saves every MXU output incl. (B, H, L, L) attention scores — only
        # viable for short sequences / small batches
        return jax.checkpoint_policies.dots_saveable
    if cfg.remat_policy == "dots_nobatch":
        # saves projection/FFN matmuls, recomputes attention einsums — the
        # sweet spot: cheap VPU+attention recompute, no (B, H, L, L) residuals
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None  # full recompute


def rms_norm(x: jax.Array, scale: jax.Array, eps: float, dtype) -> jax.Array:
    """T5 layer norm: no mean subtraction, no bias; variance in fp32."""
    h = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
    h = h * jax.lax.rsqrt(var + eps)
    return (h * scale).astype(dtype)


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """T5's log-spaced relative position bucketing (matches HF exactly)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_bias: jax.Array,
    q_len: int,
    k_len: int,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """(1, heads, q_len, k_len) additive attention bias, fp32."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, bidirectional, num_buckets, max_distance
    )
    bias = rel_bias.astype(jnp.float32)[buckets]  # (q, k, heads)
    return jnp.transpose(bias, (2, 0, 1))[None]


def _dropout(x, rate, key, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _combine_bias(bias):
    """bias is either a combined fp32 array or a lazy (shared, per_batch)
    tuple of additive components (either may be None)."""
    if isinstance(bias, tuple):
        a, b = bias
        if a is None:
            return b
        if b is None:
            return a
        return a + b
    return bias


def attention(
    p: PyTree,
    cfg: T5Config,
    x: jax.Array,
    kv: jax.Array,
    bias,
    *,
    dropout_key=None,
    deterministic: bool = True,
) -> jax.Array:
    """Multi-head attention, T5-style (no 1/sqrt(d_k) scaling).

    x: (B, Lq, D) queries source; kv: (B, Lk, D); bias: fp32 additive
    (1|B, heads, Lq, Lk) containing position bias and padding mask — either
    combined, or as a lazy (shared (1,H,Lq,Lk), per-batch (B,1,1,Lk)) tuple
    that the chunked implementation combines per key block (never
    materializing a (B,H,Lq,Lk) tensor).

    cfg.attention_impl == "chunked" uses online-softmax accumulation over
    key chunks (Rabe & Staats memory-efficient attention): transient memory
    O(B*H*Lq*chunk) instead of O(B*H*Lq*Lk). Exact; autodiff-compatible.
    Attention dropout is only supported by the dense path (the reference
    trains with dropout on weights; chunked is for long-sequence/memory
    regimes where the reference cannot run at all).
    """
    B, Lq, _ = x.shape
    Lk = kv.shape[1]
    H, dk = cfg.num_heads, cfg.d_kv
    dt = cfg.dtype
    inner = H * dk

    # Fuse the projections into one wide matmul (q|k|v for self-attention,
    # k|v for cross): one (M, D)@(D, 3*inner) GEMM at K=768/N=2304 runs at
    # FFN-like ~85-93% MXU efficiency on v5e where three (M, D)@(D, 768)
    # GEMMs run at ~64% (narrow K x N products pipeline poorly). The fused
    # weight must be PRE-CONCATENATED once per step (fuse_attention_params,
    # hoisted with the compute-dtype cast in train/step.py) — a use-site
    # concat inside the microbatch scan re-materializes it per microbatch
    # and measures SLOWER (6.80 vs 7.30 steps/s at L=188).
    # HEAD-MAJOR internal layout: q/k/v live as (B, H, L, dk) from the
    # projection onward. Projecting via the weight reshaped to (D, H, dk)
    # ("bld,dhk->bhlk") lets XLA fold the head transpose into the GEMM
    # epilogue; the per-head score/AV einsums then contract over plain
    # minor dims with NO transposes anywhere in fwd or bwd. Measured 3.15x
    # on the isolated 12-layer attention stack at monoT5-base shapes
    # (scripts/attn_layout_bench.py): the old (B, L, H, dk) layout made
    # XLA pick L-minor activation layouts and sprinkle relayout copies
    # around every attention boundary.
    d_in = x.shape[-1]

    # flash_v3 (see T5Config): the fused block kernel consumes x BEFORE
    # projection — the whole q/k/v -> softmax -> output-projection block
    # runs in VMEM. Self-attention only (x is kv), lazy-bias callers only
    # (encoder/decoder stacks pass the (shared, per_batch) tuple), no
    # attention-weight dropout.
    if cfg.flash_v3 and not deterministic:
        # same stance as the chunked+dropout check below: a silent
        # whole-run fallback to the XLA path would mislabel a flash_v3
        # A/B arm as measuring the kernel
        raise ValueError(
            "flash_v3 does not support attention-weight dropout "
            "(training with dropout=True); disable dropout or flash_v3."
        )
    if (
        cfg.flash_v3
        and deterministic
        and x is kv
        and isinstance(bias, tuple)
    ):
        from pacednegatives_tpu.ops.flash_v3 import (
            flash_v3_eligible,
            fused_self_attention,
        )

        # Multi-device: the pallas_call has no GSPMD partitioning rule, so
        # under a mesh the kernel runs per-device inside shard_map — batch
        # rows split over the combined ("data", "seq") axes (the
        # constrain_rows convention), weights/bias replicated per device.
        # flash_v3 + tensor parallelism is rejected loudly: the fused
        # block kernel needs the FULL attention weights resident per
        # device, which would force an all-gather of the model-sharded
        # weights every layer.
        from pacednegatives_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            SEQ_AXIS,
            current_mesh,
        )

        mesh = current_mesh()
        v3_shards = 1
        if mesh is not None:
            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                raise ValueError(
                    "flash_v3 does not compose with tensor (model-axis) "
                    "parallelism — the fused block kernel keeps the full "
                    "attention weights per device; set model=1 or disable "
                    "flash_v3."
                )
            v3_shards = (mesh.shape.get(DATA_AXIS, 1)
                         * mesh.shape.get(SEQ_AXIS, 1))
        elif jax.device_count() > 1 and not cfg.flash_v3_interpret:
            # >1 device but no mesh context: GSPMD would either fail to
            # partition the pallas_call or silently replicate it — fail
            # loudly like the repo's other knob misconfigurations.
            # (flash_v3_interpret runs lower as plain per-device compute
            # in tests' single-device jits, so it is exempt.)
            raise ValueError(
                "flash_v3 on >1 device requires a `with mesh:` context "
                "(the shard_map wrapper needs the mesh); or disable "
                "flash_v3."
            )
        shared, per_batch = bias
        # the kernel consumes one (H, Lq, Lk) position-bias table shared
        # across the batch; a batch-varying shared bias would be silently
        # collapsed to row 0 by the broadcast below, so gate on it.
        shared_ok = shared is None or shared.shape[0] == 1
        if flash_v3_eligible(H, Lq, Lk, dk, d_in,
                             interpret=cfg.flash_v3_interpret) and shared_ok:
            if "qkv" not in p:
                import warnings

                # loop-invariant but NOT hoisted by XLA out of the
                # microbatch scan — the measured use-site-concat tax
                # (6.80 vs 7.30 steps/s at L=188, see fused_qkv note)
                warnings.warn(
                    "flash_v3 without fused_qkv re-concatenates the QKV "
                    "weight per layer per microbatch; set fused_qkv=True "
                    "so train/step.py hoists it once per step",
                    stacklevel=2,
                )
            w3 = (
                p["qkv"] if "qkv" in p
                else jnp.concatenate([p["q"], p["k"], p["v"]], axis=-1)
            ).astype(dt)
            pos3 = (
                jnp.broadcast_to(shared[0], (H, Lq, Lk)).astype(jnp.float32)
                if shared is not None
                else jnp.zeros((H, Lq, Lk), jnp.float32)
            )
            key_mask = (
                per_batch.reshape(B, Lk).astype(jnp.float32)
                if per_batch is not None
                else jnp.zeros((B, Lk), jnp.float32)
            )
            v3_interpret = True if cfg.flash_v3_interpret else None
            if v3_shards > 1:
                if B % v3_shards:
                    raise ValueError(
                        f"flash_v3 shard_map: batch rows ({B}) must divide "
                        f"the data*seq shard count ({v3_shards})"
                    )
                import functools as _ft

                from jax.sharding import PartitionSpec as _P

                row3 = _P((DATA_AXIS, SEQ_AXIS), None, None)
                return jax.shard_map(
                    _ft.partial(fused_self_attention,
                                interpret=v3_interpret),
                    mesh=mesh,
                    in_specs=(row3, _P(), _P(), _P(),
                              _P((DATA_AXIS, SEQ_AXIS), None)),
                    out_specs=row3,
                    # the static VMA checker can't annotate pallas_call
                    # outputs (same stance as index/dense.py shard_maps)
                    check_vma=False,
                )(x, w3, p["o"].astype(dt), pos3, key_mask)
            return fused_self_attention(
                x, w3, p["o"].astype(dt), pos3, key_mask,
                interpret=v3_interpret,
            )
        if Lq == Lk and Lq >= 64:
            import warnings

            # a kernel-target shape (encoder-sized self-attention) was
            # requested but is ineligible (backend, dk, VMEM, batch-varying
            # shared bias): a silent whole-run fallback would let a
            # flash_v3 A/B arm measure the XLA path (the silent-knob
            # hazard of commit a197513). Deliberately NOT warned: decoder
            # self-attention at label length (Lq < 64) — that fallback is
            # the documented scope gate, not a misconfiguration.
            warnings.warn(
                f"flash_v3 requested but ineligible for self-attention "
                f"shape H={H} Lq={Lq} Lk={Lk} dk={dk} d_model={d_in} "
                f"(backend={jax.default_backend()}, "
                f"shared_bias_batch_ok={shared_ok}); using the XLA path",
                stacklevel=2,
            )

    # packed_lanes (see T5Config): project head PAIRS as (B, H/2, L, 2*dk)
    # so projection/output GEMMs see 128-wide minors; the packed core
    # unpacks via free minor-dim reshapes. Same einsum strings — only the
    # weight reshape and the (Hp, dkp) head geometry change.
    packed = (
        cfg.packed_lanes
        and H % 2 == 0
        and deterministic
        and cfg.attention_impl == "chunked"
        and not cfg.flash_kernel
        and not cfg.packed_heads
        and Lk <= cfg.attention_chunk
    )
    Hp, dkp = (H // 2, 2 * dk) if packed else (H, dk)

    def proj(src, w):  # (B, L, D) @ (D, H*dk) -> (B, Hp, L, dkp)
        return jnp.einsum(
            "bld,dhk->bhlk", src, w.astype(dt).reshape(d_in, Hp, dkp)
        )

    if "qkv" in p:
        w3 = p["qkv"].astype(dt).reshape(d_in, 3, Hp, dkp)
        qkv = jnp.einsum("bld,dthk->tbhlk", x, w3)
        q, k, v = qkv[0], qkv[1], qkv[2]
    elif "kv" in p:
        q = proj(x, p["q"])
        w2 = p["kv"].astype(dt).reshape(d_in, 2, Hp, dkp)
        kvp = jnp.einsum("bld,dthk->tbhlk", kv, w2)
        k, v = kvp[0], kvp[1]
    elif cfg.fused_qkv and x is kv:
        w = jnp.concatenate([p["q"], p["k"], p["v"]], axis=1).astype(dt)
        qkv = jnp.einsum("bld,dthk->tbhlk", x, w.reshape(d_in, 3, Hp, dkp))
        q, k, v = qkv[0], qkv[1], qkv[2]
    elif cfg.fused_qkv:
        q = proj(x, p["q"])
        w = jnp.concatenate([p["k"], p["v"]], axis=1).astype(dt)
        kvp = jnp.einsum("bld,dthk->tbhlk", kv, w.reshape(d_in, 2, Hp, dkp))
        k, v = kvp[0], kvp[1]
    else:
        q = proj(x, p["q"])
        k = proj(kv, p["k"])
        v = proj(kv, p["v"])

    if packed:
        out = _packed_lane_attention(q, k, v, bias)
        return jnp.einsum(
            "bhld,hdo->blo", out, p["o"].astype(dt).reshape(Hp, dkp, -1)
        )

    if cfg.attention_impl == "chunked" and not deterministic:
        raise ValueError(
            "attention_impl='chunked' does not support attention-weight "
            "dropout (training with dropout=True); a silent dense fallback "
            "would materialize the (B, H, Lq, Lk) scores chunking exists to "
            "avoid. Use dense attention or disable dropout."
        )
    if cfg.attn_residual_dtype != "fp32" and cfg.attention_impl != "chunked":
        # the residual knob lives in the chunked custom VJP; a dense run
        # labeled as a bf16-residual A/B arm would measure the baseline
        raise ValueError(
            "attn_residual_dtype='bf16' requires attention_impl='chunked' "
            "(dense attention has no flash-style residual to reduce)"
        )
    if cfg.attention_impl == "chunked":
        if (
            cfg.packed_heads
            and H % 2 == 0
            and deterministic
            and Lk <= cfg.attention_chunk
        ):
            out = _packed_pair_attention(cfg, q, k, v, bias)
        else:
            out = _chunked_attention(cfg, q, k, v, bias)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + _combine_bias(bias)
        weights = jax.nn.softmax(scores, axis=-1).astype(dt)
        if not deterministic:
            weights = _dropout(
                weights, cfg.dropout_rate, dropout_key, deterministic
            )
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    # out: (B, H, Lq, dk); contract heads+dk against o reshaped (H, dk, D)
    return jnp.einsum(
        "bhld,hdo->blo", out, p["o"].astype(dt).reshape(H, dk, -1)
    )


def _packed_lane_attention(q, k, v, bias) -> jax.Array:
    """Head-pair LANE-packed attention core (cfg.packed_lanes).

    q/k/v: (B, G, L, 2*dk) — head pair (2g, 2g+1) packed along the minor
    dim. The reshape to (B, G, L, 2, dk) is free (minor-dim subdivision);
    scores/AV batch over (b, g, t) so each head's contraction stays exactly
    dk — zero extra FLOPs, unlike the rejected block-diagonal packed_heads.
    Softmax numerics match the single-chunk fast path (max-subtract, 1e-30
    clamp). Plain autodiff: residuals include the fp32 probability tensor,
    so this path targets L <= chunk configs where that fits comfortably.
    """
    B, G, Lq, kk = q.shape
    dk = kk // 2
    Lk = k.shape[2]
    qt = q.reshape(B, G, Lq, 2, dk)
    kt = k.reshape(B, G, Lk, 2, dk)
    vt = v.reshape(B, G, Lk, 2, dk)
    s = jnp.einsum(
        "bgqtd,bgktd->bgtqk", qt, kt, preferred_element_type=jnp.float32
    )
    cb = _combine_bias(bias)
    if cb is not None:
        if cb.shape[1] == 1:  # head-broadcast bias (e.g. pure padding mask)
            s = s + cb[:, :, None]
        else:  # per-head (1|B, H, Lq, Lk): h = g*2 + t matches the packing
            s = s + cb.reshape(cb.shape[0], G, 2, cb.shape[2], cb.shape[3])
    m = s.max(axis=-1, keepdims=True)
    w = jnp.exp(s - m)
    w = (w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)).astype(q.dtype)
    o = jnp.einsum("bgtqk,bgktd->bgqtd", w, vt)
    return o.reshape(B, G, Lq, kk)


def _packed_pair_attention(cfg: T5Config, q, k, v, bias) -> jax.Array:
    """Head-PAIR attention as dense block-diagonal GEMMs (cfg.packed_heads).

    Per-head monoT5-shape einsums (M=N=L~188, K=dk=64) run at ~20-25% MXU
    efficiency on v5e: K=64 fills half the 128-wide contraction lanes and
    L=188 fills 73% of two 128 tiles. This path computes TWO heads per GEMM
    with zero wasted flops:

      Q' = [q_h0 | q_h1]                 (B, HP, Lq, 2dk)   K' doubled
      K' = [[k_h0, 0], [0, k_h1]]        (B, HP, 2Lk, 2dk)  block-diagonal
      S' = Q' K'^T = [S_h0 | S_h1]       (B, HP, Lq, 2Lk)   N tiles ~full

    softmax runs per head block (reshape (..., 2, Lk) — free, row-major),
    and AV uses the same trick with V' block-diagonal so the contraction is
    2Lk wide. The zero blocks are constructed, not parameters, so autodiff
    routes their cotangents back through the concat slices for free.
    Numerically identical to dense attention (same flops, same order up to
    fp32 reduction grouping); scores materialize like the dense path, so
    this is for short-sequence regimes (gated on Lk <= attention_chunk).
    """
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    HP = H // 2
    dt = cfg.dtype
    # (B, H, L, dk) -> (B, HP, 2, L, dk); head h = 2*hp + i throughout
    qh = q.reshape(B, HP, 2, Lq, dk)
    kh = k.reshape(B, HP, 2, Lk, dk)
    vh = v.reshape(B, HP, 2, Lk, dk)
    q2 = jnp.concatenate([qh[:, :, 0], qh[:, :, 1]], axis=-1)
    z = jnp.zeros_like(kh[:, :, 0])
    k2 = jnp.concatenate(
        [
            jnp.concatenate([kh[:, :, 0], z], axis=-1),
            jnp.concatenate([z, kh[:, :, 1]], axis=-1),
        ],
        axis=2,
    )
    v2 = jnp.concatenate(
        [
            jnp.concatenate([vh[:, :, 0], z], axis=-1),
            jnp.concatenate([z, vh[:, :, 1]], axis=-1),
        ],
        axis=2,
    )
    s = jnp.einsum(
        "bple,bpke->bplk", q2, k2, preferred_element_type=jnp.float32
    ).reshape(B, HP, Lq, 2, Lk)
    # biases added per component to avoid materializing their broadcast sum
    shared, per_batch = bias if isinstance(bias, tuple) else (bias, None)
    for b4 in (shared, per_batch):
        if b4 is None:
            continue
        if b4.ndim == 3:
            b4 = b4[None]
        if b4.shape[1] == 1:  # head-broadcast (e.g. key padding mask)
            s = s + b4[:, :, :, None, :].astype(jnp.float32)
        else:
            bb = b4.reshape(b4.shape[0], HP, 2, b4.shape[2], Lk)
            s = s + bb.transpose(0, 1, 3, 2, 4).astype(jnp.float32)
    m = s.max(axis=-1, keepdims=True)
    p_ = jnp.exp(s - m)
    l = jnp.maximum(p_.sum(axis=-1, keepdims=True), 1e-30)
    p_ = (p_ / l).astype(dt).reshape(B, HP, Lq, 2 * Lk)
    o2 = jnp.einsum(
        "bplk,bpke->bple", p_, v2, preferred_element_type=jnp.float32
    )
    out = (
        o2.reshape(B, HP, Lq, 2, dk)
        .transpose(0, 1, 3, 2, 4)  # (B, HP, 2, Lq, dk)
        .reshape(B, H, Lq, dk)
    )
    return out.astype(dt)


def _chunked_attention(cfg: T5Config, q, k, v, bias) -> jax.Array:
    """Online-softmax attention over key chunks with a flash-style custom
    VJP. q/k/v: (B, H, L, dk) head-major; returns (B, H, Lq, dk) in compute
    dtype.

    The backward recomputes per-chunk probabilities from the saved softmax
    statistics (m, l) instead of letting autodiff store every chunk's
    (B, H, Lq, C) matrix — without the custom VJP, differentiating the scan
    costs exactly the dense-attention memory it was meant to avoid
    (measured: 20+GB HLO temp at B=16, n=7, L=512 on t5-base).
    """
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    C = min(cfg.attention_chunk, Lk)
    shared, per_batch = bias if isinstance(bias, tuple) else (bias, None)

    pad = (-Lk) % C
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if shared is not None:
            shared = jnp.pad(
                shared, ((0, 0),) * 3 + ((0, pad),), constant_values=NEG_INF
            )
        if per_batch is not None:
            per_batch = jnp.pad(
                per_batch, ((0, 0),) * 3 + ((0, pad),), constant_values=NEG_INF
            )
        elif shared is None:
            # no masks at all: mask the padded keys explicitly
            per_batch = jnp.where(
                jnp.arange(Lk + pad) < Lk, 0.0, NEG_INF
            ).astype(jnp.float32)[None, None, None, :]
    if shared is None:
        shared = jnp.zeros((1, 1, 1, 1), jnp.float32)
    if per_batch is None:
        per_batch = jnp.zeros((1, 1, 1, 1), jnp.float32)

    impl = (
        ("pallas", cfg.flash_q_block)
        if cfg.flash_kernel and pallas_flash_eligible(Lq, k.shape[2], dk)
        else "xla"
    )
    if cfg.attn_residual_dtype not in ("fp32", "bf16"):
        # a typo silently measuring the fp32 baseline would mislabel an
        # A/B experiment — fail loudly at trace time
        raise ValueError(
            f"attn_residual_dtype must be 'fp32' or 'bf16', "
            f"got {cfg.attn_residual_dtype!r}"
        )
    out = _flash_core(
        C, impl, cfg.attn_residual_dtype, q, k, v, shared, per_batch
    )
    return out.astype(cfg.dtype)


def _unbroadcast(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Sum-reduce x back to a broadcastable input shape."""
    axes = tuple(i for i, (a, b) in enumerate(zip(x.shape, shape)) if b == 1 and a != 1)
    if axes:
        x = x.sum(axis=axes, keepdims=True)
    return x


def _bias_chunk(src, j, C):
    """Slice chunk j along the key axis; size-1 (broadcast) axes pass through."""
    if src.shape[3] == 1:
        return src
    return jax.lax.dynamic_slice_in_dim(src, j * C, C, axis=3)


def _flash_forward(C, q, k, v, shared, per_batch):
    """q/k/v head-major (B, H, L, dk); returns (out (B, H, Lq, dk) fp32,
    (m, l, out_bhqd)) — out IS out_bhqd, no layout change anywhere."""
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    n_chunks = Lk // C

    if n_chunks == 1:
        # single-chunk fast path (covers any L <= attention_chunk): no
        # scan wrapper, no online-softmax correction passes, no k/v
        # re-chunking copies — one softmax, same (m, l) statistics
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        s = s + shared + per_batch  # dummies are zeros (1,1,1,1); broadcast
        m = s.max(axis=-1)
        p_ = jnp.exp(s - m[..., None])
        l = jnp.maximum(p_.sum(axis=-1), 1e-30)
        out_bhqd = jnp.einsum(
            "bhqk,bhkd->bhqd", p_.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ) / l[..., None]
        return out_bhqd, (m, l, out_bhqd)

    k_c = k.reshape(B, H, n_chunks, C, dk).transpose(2, 0, 1, 3, 4)
    v_c = v.reshape(B, H, n_chunks, C, dk).transpose(2, 0, 1, 3, 4)

    def body(carry, inputs):
        m, l, acc = carry
        j, k_j, v_j = inputs
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_j, preferred_element_type=jnp.float32
        )
        s = s + _bias_chunk(shared, j, C) + _bias_chunk(per_batch, j, C)
        m_new = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p_ = jnp.exp(s - m_new[..., None])
        l = l * corr + p_.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p_.astype(v_j.dtype), v_j,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc), None

    init = (
        jnp.full((B, H, Lq), NEG_INF, jnp.float32),
        jnp.zeros((B, H, Lq), jnp.float32),
        jnp.zeros((B, H, Lq, dk), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (jnp.arange(n_chunks), k_c, v_c))
    l = jnp.maximum(l, 1e-30)
    out_bhqd = acc / l[..., None]
    return out_bhqd, (m, l, out_bhqd)


def _impl_kind(impl):
    """impl is "xla" | "pallas" | ("pallas", q_block)."""
    if isinstance(impl, tuple):
        return impl[0], impl[1]
    return impl, 128


def _pallas_forward(C, q_block, q, k, v, shared, per_batch):
    """Fused Mosaic forward (ops/flash.py): same contract as
    _flash_forward — returns (out (B, H, Lq, dk) fp32, (m, l, out_bhqd))
    so the XLA flash backward below is reused unchanged. The kernels were
    always head-major internally; with the model now head-major too, the
    boundary transposes are gone. The kernel keeps scores/probabilities in
    VMEM, eliminating the (B, H, Lq, C) HBM transients the XLA scan
    materializes each chunk."""
    from pacednegatives_tpu.ops.flash import (
        flash_attention_forward,
        flash_attention_forward_v2,
        flash_v2_eligible,
    )

    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    pos = shared
    if pos.shape[3] == 1:  # dummy zeros (1, 1, 1, 1)
        pos = jnp.zeros((1, H, Lq, Lk), jnp.float32)
    pos3 = jnp.broadcast_to(pos[0], (H, Lq, Lk))
    if per_batch.shape[3] == 1:
        key_mask = jnp.zeros((B, Lk), jnp.float32)
    else:
        key_mask = per_batch.reshape(B, Lk)
    if flash_v2_eligible(H, Lq, Lk, dk):
        out_bhqd, m, l = flash_attention_forward_v2(
            q, k, v, pos3, key_mask,
            q_block=q_block, out_dtype=jnp.float32,
        )
    else:
        kv_block = C if C % 128 == 0 and Lk % C == 0 else 128
        out_bhqd, m, l = flash_attention_forward(
            q, k, v, pos3, key_mask,
            q_block=128, kv_block=kv_block, out_dtype=jnp.float32,
        )
    return out_bhqd, (m, l, out_bhqd)


def pallas_flash_eligible(Lq: int, Lk_padded: int, dk: int) -> bool:
    """Shape gate for the Mosaic forward: 128-aligned query/key lengths,
    lane-width head dim, TPU backend."""
    return (
        Lq % 128 == 0
        and Lk_padded % 128 == 0
        and dk in (64, 128)
        and jax.default_backend() == "tpu"
    )


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_core(C, impl, res_dtype, q, k, v, shared, per_batch):
    kind, qb = _impl_kind(impl)
    if kind == "pallas":
        out, _ = _pallas_forward(C, qb, q, k, v, shared, per_batch)
    else:
        out, _ = _flash_forward(C, q, k, v, shared, per_batch)
    return out


def _flash_core_fwd(C, impl, res_dtype, q, k, v, shared, per_batch):
    kind, qb = _impl_kind(impl)
    if kind == "pallas":
        out, (m, l, out_bhqd) = _pallas_forward(C, qb, q, k, v, shared, per_batch)
    else:
        out, (m, l, out_bhqd) = _flash_forward(C, q, k, v, shared, per_batch)
    if res_dtype == "bf16":
        # the residual feeds only D = sum(g * out); softmax stats (m, l)
        # stay fp32 (tiny, and exp(s - m) needs the exact m)
        out_bhqd = out_bhqd.astype(jnp.bfloat16)
    return out, (q, k, v, shared, per_batch, m, l, out_bhqd)


def _pallas_backward(C, q_block, res, g):
    """Mosaic flash backward (ops/flash.py): same residual contract as the
    XLA path. Returns zeros for the per-batch key-mask grad — that bias is
    derived from integer attention masks everywhere in this model (encode:
    input padding; decode cross: encoder padding), so no gradient consumer
    exists; the XLA backward stays the general path."""
    from pacednegatives_tpu.ops.flash import (
        flash_attention_backward,
        flash_attention_backward_v2,
        flash_v2_eligible,
    )

    q, k, v, shared, per_batch, m, l, out_bhqd = res
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    pos = shared
    if pos.shape[3] == 1:
        pos = jnp.zeros((1, H, Lq, Lk), jnp.float32)
    pos3 = jnp.broadcast_to(pos[0], (H, Lq, Lk))
    if per_batch.shape[3] == 1:
        key_mask = jnp.zeros((B, Lk), jnp.float32)
    else:
        key_mask = per_batch.reshape(B, Lk)

    g_bhqd = g.astype(jnp.float32)
    D = jnp.sum(g_bhqd * out_bhqd.astype(jnp.float32), axis=-1)  # (B, H, Lq)
    if flash_v2_eligible(H, Lq, Lk, dk):
        dq_bh, dk_bh, dv_bh, dpos = flash_attention_backward_v2(
            q, k, v, pos3, key_mask, m, l, D, g_bhqd,
            q_block=q_block,
        )
    else:
        kv_block = C if C % 128 == 0 and Lk % C == 0 else 128
        dq_bh, dk_bh, dv_bh, dpos = flash_attention_backward(
            q, k, v, pos3, key_mask, m, l, D, g_bhqd,
            q_block=128, kv_block=kv_block,
        )
    dshared = (
        dpos[None].astype(shared.dtype)
        if shared.shape[3] != 1
        else jnp.zeros(shared.shape, shared.dtype)
    )
    return (
        dq_bh.astype(q.dtype),
        dk_bh.astype(k.dtype),
        dv_bh.astype(v.dtype),
        dshared,
        jnp.zeros(per_batch.shape, per_batch.dtype),
    )


def _flash_core_bwd(C, impl, res_dtype, res, g):
    kind, qb = _impl_kind(impl)
    if kind == "pallas":
        return _pallas_backward(C, qb, res, g)
    q, k, v, shared, per_batch, m, l, out_bhqd = res
    B, H, Lq, dk = q.shape
    Lk = k.shape[2]
    n_chunks = Lk // C
    k_c = k.reshape(B, H, n_chunks, C, dk).transpose(2, 0, 1, 3, 4)
    v_c = v.reshape(B, H, n_chunks, C, dk).transpose(2, 0, 1, 3, 4)

    g_bhqd = g.astype(jnp.float32)
    # D_i = sum_d dout_i * out_i  (flash backward identity); the residual
    # may be stored bf16 (attn_residual_dtype) — accumulate D in fp32
    D = jnp.sum(g_bhqd * out_bhqd.astype(jnp.float32), axis=-1)  # (B, H, Lq)

    dshared_shape = shared.shape
    dper_shape = per_batch.shape

    # Matmul inputs stay in the COMPUTE dtype (bf16) with fp32 accumulation
    # (preferred_element_type) — upcasting the operands to fp32 would halve
    # MXU throughput and double HBM traffic for 2/3 of the attention FLOPs,
    # and the dense path's autodiff computes these same products in bf16.
    # Softmax math (exp, the ds combination) stays fp32.
    cdt = q.dtype
    g_c = g_bhqd.astype(cdt)

    if n_chunks == 1:
        # single-chunk fast path: mirrors the forward — no scan, no
        # dynamic-slice bias accumulation
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        s = s + shared + per_batch
        p_ = jnp.exp(s - m[..., None]) / l[..., None]
        dv = jnp.einsum(
            "bhqk,bhqd->bhkd", p_.astype(cdt), g_c,
            preferred_element_type=jnp.float32,
        )
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", g_c, v, preferred_element_type=jnp.float32
        )
        ds = p_ * (dp - D[..., None])
        ds_c = ds.astype(cdt)
        dq = jnp.einsum(
            "bhqk,bhkd->bhqd", ds_c, k, preferred_element_type=jnp.float32
        )
        dk_full = jnp.einsum(
            "bhqk,bhqd->bhkd", ds_c, q, preferred_element_type=jnp.float32
        )
        return (
            dq.astype(q.dtype),
            dk_full.astype(k.dtype),
            dv.astype(v.dtype),
            _unbroadcast(ds, dshared_shape).astype(shared.dtype),
            _unbroadcast(ds, dper_shape).astype(per_batch.dtype),
        )

    def body(carry, inputs):
        dq, dshared, dper = carry
        j, k_j, v_j = inputs
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_j, preferred_element_type=jnp.float32
        )
        s = s + _bias_chunk(shared, j, C) + _bias_chunk(per_batch, j, C)
        p_ = jnp.exp(s - m[..., None]) / l[..., None]  # (B, H, Lq, C)
        dv_j = jnp.einsum(
            "bhqk,bhqd->bhkd", p_.astype(cdt), g_c,
            preferred_element_type=jnp.float32,
        )
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", g_c, v_j,
            preferred_element_type=jnp.float32,
        )
        ds = p_ * (dp - D[..., None])  # (B, H, Lq, C) fp32
        ds_c = ds.astype(cdt)
        dq = dq + jnp.einsum(
            "bhqk,bhkd->bhqd", ds_c, k_j,
            preferred_element_type=jnp.float32,
        )
        dk_j = jnp.einsum(
            "bhqk,bhqd->bhkd", ds_c, q,
            preferred_element_type=jnp.float32,
        )
        # bias grads: reduce ds to each bias's (broadcast) chunk shape, then
        # scatter-add into the full-length accumulator
        ds_shared = _unbroadcast(
            ds, dshared_shape[:3] + (C if dshared_shape[3] != 1 else 1,)
        )
        ds_per = _unbroadcast(
            ds, dper_shape[:3] + (C if dper_shape[3] != 1 else 1,)
        )
        if dshared_shape[3] != 1:
            dshared = jax.lax.dynamic_update_slice_in_dim(
                dshared,
                jax.lax.dynamic_slice_in_dim(dshared, j * C, C, 3) + ds_shared,
                j * C, 3,
            )
        else:
            dshared = dshared + ds_shared
        if dper_shape[3] != 1:
            dper = jax.lax.dynamic_update_slice_in_dim(
                dper,
                jax.lax.dynamic_slice_in_dim(dper, j * C, C, 3) + ds_per,
                j * C, 3,
            )
        else:
            dper = dper + ds_per
        return (dq, dshared, dper), (dk_j, dv_j)

    init = (
        jnp.zeros((B, H, Lq, dk), jnp.float32),
        jnp.zeros(dshared_shape, jnp.float32),
        jnp.zeros(dper_shape, jnp.float32),
    )
    (dq, dshared, dper), (dk_c, dv_c) = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), k_c, v_c)
    )
    # (n_chunks, B, H, C, dk) -> (B, H, Lk, dk)
    dk = dk_c.transpose(1, 2, 0, 3, 4).reshape(B, H, Lk, dk_c.shape[-1])
    dv = dv_c.transpose(1, 2, 0, 3, 4).reshape(B, H, Lk, dv_c.shape[-1])
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dshared.astype(shared.dtype),
        dper.astype(per_batch.dtype),
    )


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@jax.custom_vjp
def _relu_ffn(x, wi, wo):
    h = jax.nn.relu(jnp.einsum("bld,df->blf", x, wi))
    return jnp.einsum("blf,fd->bld", h, wo)


def _relu_ffn_fwd(x, wi, wo):
    h = jax.nn.relu(jnp.einsum("bld,df->blf", x, wi))
    return jnp.einsum("blf,fd->bld", h, wo), (x, wi, wo, h)


def _relu_ffn_bwd(res, g):
    x, wi, wo, h = res
    dh = jnp.einsum("bld,fd->blf", g, wo)
    # relu'(s) == (h > 0): exact wherever s != 0, and both are 0 at s == 0
    ds = jnp.where(h > 0, dh, jnp.zeros((), dh.dtype))
    dx = jnp.einsum("blf,df->bld", ds, wi)
    dwi = jnp.einsum("bld,blf->df", x, ds)
    dwo = jnp.einsum("blf,bld->fd", h, g)
    return dx, dwi, dwo


_relu_ffn.defvjp(_relu_ffn_fwd, _relu_ffn_bwd)


def mlp(p: PyTree, cfg: T5Config, x: jax.Array) -> jax.Array:
    dt = cfg.dtype
    if cfg.gated_ffn:
        # approximate=True == HF NewGELUActivation (tanh form) used by
        # T5 v1.1's gated FFN
        h = jax.nn.gelu(
            jnp.einsum("bld,df->blf", x, p["wi_0"].astype(dt)), approximate=True
        ) * jnp.einsum("bld,df->blf", x, p["wi_1"].astype(dt))
    else:
        if cfg.ffn_custom_vjp:
            return _relu_ffn(x, p["wi"].astype(dt), p["wo"].astype(dt))
        h = jax.nn.relu(jnp.einsum("bld,df->blf", x, p["wi"].astype(dt)))
    return jnp.einsum("blf,fd->bld", h, p["wo"].astype(dt))


def _stack_blocks(blocks: list) -> PyTree:
    """Stack per-layer block pytrees into one (L, ...) pytree for lax.scan.

    block_0's relative-attention bias is excluded — position bias is computed
    once outside the layer loop and closed over by the scan body."""
    cleaned = []
    for b in blocks:
        sa = {k: v for k, v in b["self_attn"].items() if k != "rel_bias"}
        cleaned.append({**b, "self_attn": sa})
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cleaned)


def stack_params(params: PyTree) -> PyTree:
    """Convert the per-layer ``block_i`` layout to the NATIVE stacked layout:
    ``{"blocks": <(L, ...) pytree>, "rel_bias": ..., "final_ln": ...}`` per
    stack. With this layout ``scan_layers`` consumes the arrays directly —
    no per-trace jnp.stack of every block parameter (the ~9% steady-state
    scan tax measured in round 1; ROADMAP item 4)."""

    def one(stack: dict, n: int) -> dict:
        blocks = [stack[f"block_{i}"] for i in range(n)]
        return {
            "blocks": _stack_blocks(blocks),
            "rel_bias": blocks[0]["self_attn"]["rel_bias"],
            "final_ln": stack["final_ln"],
        }

    n_enc = len([k for k in params["encoder"] if k.startswith("block_")])
    n_dec = len([k for k in params["decoder"] if k.startswith("block_")])
    out = dict(params)
    out["encoder"] = one(params["encoder"], n_enc)
    out["decoder"] = one(params["decoder"], n_dec)
    return out


def unstack_params(params: PyTree) -> PyTree:
    """Inverse of stack_params (for HF export / layout-agnostic tooling)."""

    def one(stack: dict) -> dict:
        blocks = stack["blocks"]
        n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        out = {}
        for i in range(n):
            blk = jax.tree_util.tree_map(lambda x: x[i], blocks)
            if i == 0:
                blk = {
                    **blk,
                    "self_attn": {**blk["self_attn"], "rel_bias": stack["rel_bias"]},
                }
            out[f"block_{i}"] = blk
        out["final_ln"] = stack["final_ln"]
        return out

    out = dict(params)
    out["encoder"] = one(params["encoder"])
    out["decoder"] = one(params["decoder"])
    return out


def fuse_attention_params(params: PyTree) -> PyTree:
    """Concatenate per-block projection weights for wide-GEMM attention:
    self-attention q|k|v -> "qkv" (d, 3*inner), cross-attention k|v -> "kv"
    (d, 2*inner); the originals are dropped from the returned tree.

    Call ONCE PER STEP (train/step.py hoists it with the compute-dtype
    cast): on v5e the merged (768, 2304) projection GEMM pipelines like the
    FFN matmuls (~85-93% MXU) where the three narrow (768, 768) ones reach
    only ~64%. Gradients over the fused tree are split back to the
    reference q/k/v layout by split_attention_grads, so optimizer state and
    checkpoints keep per-projection parity."""

    def walk(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for name, v in d.items():
            if name == "self_attn" and isinstance(v, dict) and "q" in v:
                v = {
                    **{k2: v2 for k2, v2 in v.items()
                       if k2 not in ("q", "k", "v")},
                    "qkv": jnp.concatenate([v["q"], v["k"], v["v"]], axis=-1),
                }
            elif name == "cross_attn" and isinstance(v, dict) and "k" in v:
                v = {
                    **{k2: v2 for k2, v2 in v.items()
                       if k2 not in ("k", "v")},
                    "kv": jnp.concatenate([v["k"], v["v"]], axis=-1),
                }
            else:
                v = walk(v)
            out[name] = v
        return out

    return walk(params)


def split_attention_grads(grads: PyTree) -> PyTree:
    """Inverse of fuse_attention_params for gradient trees: split "qkv" /
    "kv" cotangents back into per-projection leaves (lane-aligned slices)."""

    def walk(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for name, v in d.items():
            if isinstance(v, dict) and "qkv" in v:
                g = v["qkv"]
                i = g.shape[-1] // 3
                v = {
                    **{k2: v2 for k2, v2 in v.items() if k2 != "qkv"},
                    "q": g[..., :i], "k": g[..., i:2 * i], "v": g[..., 2 * i:],
                }
            elif isinstance(v, dict) and "kv" in v:
                g = v["kv"]
                i = g.shape[-1] // 2
                v = {
                    **{k2: v2 for k2, v2 in v.items() if k2 != "kv"},
                    "k": g[..., :i], "v": g[..., i:],
                }
            else:
                v = walk(v)
            out[name] = v
        return out

    return walk(grads)


def _rel_bias(stack: dict) -> jax.Array:
    """Relative-attention bias for a stack, either layout."""
    if "rel_bias" in stack:
        return stack["rel_bias"]
    return stack["block_0"]["self_attn"]["rel_bias"]


def _padding_bias(mask: jax.Array) -> jax.Array:
    """(B, L) {0,1} mask -> (B, 1, 1, L) fp32 additive bias."""
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)


def _causal_bias(L: int) -> jax.Array:
    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))
    return jnp.where(causal, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def position_bias_cache(params: PyTree, cfg: "T5Config", l_enc: int,
                        l_dec: int) -> dict:
    """Precompute the (1, H, L, L) relative-position biases for one step.

    The bucket gather behind compute_position_bias is scatter-heavy VPU
    work (~21 ms/step at t5-base L=512) and is loop-INVARIANT across
    grad-accumulation microbatches, but XLA does not hoist it out of the
    scan. Training steps compute this once per step via jax.vjp and pass
    it into encode/decode (train/step.py), folding the accumulated bias
    cotangent back into the rel_bias parameter gradient — numerically the
    same gradient, 1/k the gathers. The decoder entry includes the causal
    mask (constant; zero gradient)."""
    return position_bias_from_tables(
        _rel_bias(params["encoder"]), _rel_bias(params["decoder"]),
        cfg, l_enc, l_dec,
    )


def position_bias_from_tables(enc_rel_bias: jax.Array,
                              dec_rel_bias: jax.Array,
                              cfg: "T5Config", l_enc: int, l_dec: int) -> dict:
    """position_bias_cache on the two (buckets, H) tables directly — the
    differentiable inputs train/step.py takes a vjp against (so the bias
    cotangent folds back into exactly two leaves, not the whole pytree)."""
    enc_bias = compute_position_bias(
        enc_rel_bias, l_enc, l_enc, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    dec_bias = compute_position_bias(
        dec_rel_bias, l_dec, l_dec, False,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    ) + _causal_bias(l_dec)
    return {"enc": enc_bias, "dec_self": dec_bias}


# ---------------------------------------------------------------------------
# Stacks
# ---------------------------------------------------------------------------


def encode(
    params: PyTree,
    cfg: T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    *,
    deterministic: bool = True,
    dropout_key: jax.Array | None = None,
    pos_bias: jax.Array | None = None,  # precomputed (position_bias_cache)
) -> jax.Array:
    """Encoder stack: (B, L) token ids -> (B, L, D) hidden states."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    enc = params["encoder"]
    dt = cfg.dtype
    L = input_ids.shape[1]

    emb = params["shared"]["embedding"].astype(dt)
    x = emb[input_ids]

    if pos_bias is None:
        pos_bias = compute_position_bias(
            _rel_bias(enc),
            L, L, True,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
    # lazy (shared, per-batch) pair: the dense path sums them; the chunked
    # path combines per key block without forming (B, H, L, L)
    bias = (pos_bias, _padding_bias(attention_mask))

    keys = (
        jax.random.split(dropout_key, 2 * cfg.num_layers + 2)
        if dropout_key is not None
        else [None] * (2 * cfg.num_layers + 2)
    )
    x = _dropout(x, cfg.dropout_rate, keys[-1], deterministic)

    def block(x, blk, bias, k0, k1):
        # split per-use: attention-weight dropout and the residual dropout
        # must draw independent masks (the reference's torch layers do)
        ka, kr = jax.random.split(k0) if k0 is not None else (None, None)
        h = rms_norm(x, blk["ln_self"]["scale"], cfg.layer_norm_epsilon, dt)
        a = attention(
            blk["self_attn"], cfg, h, h, bias,
            dropout_key=ka, deterministic=deterministic,
        )
        x = x + _dropout(a, cfg.dropout_rate, kr, deterministic)
        h = rms_norm(x, blk["ln_mlp"]["scale"], cfg.layer_norm_epsilon, dt)
        m = mlp(blk["mlp"], cfg, h)
        return x + _dropout(m, cfg.dropout_rate, k1, deterministic)

    if cfg.scan_layers and "blocks" not in enc:
        # legacy block_i layout is stacked inside the trace (≈9% step tax)
        enc = {**enc, "blocks": _stack_blocks(
            [enc[f"block_{i}"] for i in range(cfg.num_layers)]
        )}
    if "blocks" in enc and cfg.scan_layers:
        stacked = enc["blocks"]
        use_keys = dropout_key is not None and not deterministic
        layer_keys = (
            jnp.stack([jnp.stack([keys[2 * i], keys[2 * i + 1]]) for i in range(cfg.num_layers)])
            if use_keys
            else jnp.zeros((cfg.num_layers, 1), jnp.int32)  # placeholder carry
        )

        def body(x, scanned):
            blk, lk = scanned
            k0 = lk[0] if use_keys else None
            k1 = lk[1] if use_keys else None
            return block(x, blk, bias, k0, k1), None

        if cfg.remat:
            body = jax.checkpoint(body, policy=_remat_policy(cfg))
        x, _ = jax.lax.scan(body, x, (stacked, layer_keys))
    elif "blocks" in enc:
        # Unrolled loop over the STACKED layout: static per-layer slices the
        # compiler folds away. The lax.scan path stages every sliced layer
        # parameter through scratch memory with tiny async copies each
        # iteration — measured ~7,000 copy-done events (~11 ms) per train
        # step at t5-base; unrolling removes them. scan_layers=True trades
        # that time back for compile-time/HLO-size savings.
        for i in range(cfg.num_layers):
            blk = jax.tree_util.tree_map(lambda a: a[i], enc["blocks"])
            blk_fn = block
            if cfg.remat:
                blk_fn = jax.checkpoint(block, policy=_remat_policy(cfg))
            x = blk_fn(x, blk, bias, keys[2 * i], keys[2 * i + 1])
    else:
        for i in range(cfg.num_layers):
            blk_fn = block
            if cfg.remat:
                blk_fn = jax.checkpoint(block, policy=_remat_policy(cfg))
            x = blk_fn(x, enc[f"block_{i}"], bias, keys[2 * i], keys[2 * i + 1])

    x = rms_norm(x, enc["final_ln"]["scale"], cfg.layer_norm_epsilon, dt)
    return _dropout(x, cfg.dropout_rate, keys[-2], deterministic)


def decode(
    params: PyTree,
    cfg: T5Config,
    decoder_input_ids: jax.Array,
    encoder_hidden: jax.Array,
    encoder_mask: jax.Array,
    *,
    deterministic: bool = True,
    dropout_key: jax.Array | None = None,
    self_pos_bias: jax.Array | None = None,  # precomputed, incl. causal
) -> jax.Array:
    """Decoder stack with teacher forcing -> (B, Lt, vocab) logits."""
    dec = params["decoder"]
    dt = cfg.dtype
    Lt = decoder_input_ids.shape[1]

    emb = params["shared"]["embedding"].astype(dt)
    x = emb[decoder_input_ids]

    if self_pos_bias is None:
        self_pos_bias = compute_position_bias(
            _rel_bias(dec),
            Lt, Lt, False,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        ) + _causal_bias(Lt)
    self_bias = (self_pos_bias, None)
    cross_bias = (None, _padding_bias(encoder_mask))

    nk = 3 * cfg.num_decoder_layers + 2
    keys = (
        jax.random.split(dropout_key, nk)
        if dropout_key is not None
        else [None] * nk
    )
    x = _dropout(x, cfg.dropout_rate, keys[-1], deterministic)

    def block(x, blk, self_bias, cross_bias, enc_h, k0, k1, k2):
        ka0, kr0 = jax.random.split(k0) if k0 is not None else (None, None)
        ka1, kr1 = jax.random.split(k1) if k1 is not None else (None, None)
        h = rms_norm(x, blk["ln_self"]["scale"], cfg.layer_norm_epsilon, dt)
        a = attention(
            blk["self_attn"], cfg, h, h, self_bias,
            dropout_key=ka0, deterministic=deterministic,
        )
        x = x + _dropout(a, cfg.dropout_rate, kr0, deterministic)
        h = rms_norm(x, blk["ln_cross"]["scale"], cfg.layer_norm_epsilon, dt)
        a = attention(
            blk["cross_attn"], cfg, h, enc_h, cross_bias,
            dropout_key=ka1, deterministic=deterministic,
        )
        x = x + _dropout(a, cfg.dropout_rate, kr1, deterministic)
        h = rms_norm(x, blk["ln_mlp"]["scale"], cfg.layer_norm_epsilon, dt)
        m = mlp(blk["mlp"], cfg, h)
        return x + _dropout(m, cfg.dropout_rate, k2, deterministic)

    if cfg.scan_layers and "blocks" not in dec:
        dec = {**dec, "blocks": _stack_blocks(
            [dec[f"block_{i}"] for i in range(cfg.num_decoder_layers)]
        )}
    if "blocks" in dec and cfg.scan_layers:
        stacked = dec["blocks"]
        use_keys = dropout_key is not None and not deterministic
        layer_keys = (
            jnp.stack([
                jnp.stack([keys[3 * i], keys[3 * i + 1], keys[3 * i + 2]])
                for i in range(cfg.num_decoder_layers)
            ])
            if use_keys
            else jnp.zeros((cfg.num_decoder_layers, 1), jnp.int32)
        )

        def body(x, scanned):
            blk, lk = scanned
            ks = (lk[0], lk[1], lk[2]) if use_keys else (None, None, None)
            return block(x, blk, self_bias, cross_bias, encoder_hidden, *ks), None

        if cfg.remat:
            body = jax.checkpoint(body, policy=_remat_policy(cfg))
        x, _ = jax.lax.scan(body, x, (stacked, layer_keys))
    elif "blocks" in dec:
        # unrolled stacked layout — see the encoder-side comment
        for i in range(cfg.num_decoder_layers):
            blk = jax.tree_util.tree_map(lambda a: a[i], dec["blocks"])
            blk_fn = block
            if cfg.remat:
                blk_fn = jax.checkpoint(block, policy=_remat_policy(cfg))
            x = blk_fn(
                x, blk, self_bias, cross_bias, encoder_hidden,
                keys[3 * i], keys[3 * i + 1], keys[3 * i + 2],
            )
    else:
        for i in range(cfg.num_decoder_layers):
            blk_fn = block
            if cfg.remat:
                blk_fn = jax.checkpoint(block, policy=_remat_policy(cfg))
            x = blk_fn(
                x, dec[f"block_{i}"], self_bias, cross_bias, encoder_hidden,
                keys[3 * i], keys[3 * i + 1], keys[3 * i + 2],
            )

    x = rms_norm(x, dec["final_ln"]["scale"], cfg.layer_norm_epsilon, dt)
    x = _dropout(x, cfg.dropout_rate, keys[-2], deterministic)

    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model**-0.5)
        logits = jnp.einsum(
            "bld,vd->blv", x, emb, preferred_element_type=jnp.float32
        )
    else:
        logits = jnp.einsum(
            "bld,vd->blv",
            x,
            params["lm_head"]["embedding"].astype(dt),
            preferred_element_type=jnp.float32,
        )
    return logits


def shift_right(labels: jax.Array, cfg: T5Config) -> jax.Array:
    """Teacher-forcing decoder inputs from labels (-100 treated as pad)."""
    labels = jnp.where(labels == -100, cfg.pad_token_id, labels)
    return jnp.concatenate(
        [
            jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id, labels.dtype),
            labels[:, :-1],
        ],
        axis=1,
    )


def forward_logits(
    params: PyTree,
    cfg: T5Config,
    input_ids: jax.Array,
    labels: jax.Array,
    attention_mask: jax.Array | None = None,
    *,
    deterministic: bool = True,
    dropout_key: jax.Array | None = None,
    pos_biases: dict | None = None,  # from position_bias_cache
) -> jax.Array:
    """Full seq2seq forward: equivalent of ``model(input_ids, labels).logits``
    in the reference (old/eta_bound.py:69-71) — one teacher-forced pass."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    if dropout_key is not None and not deterministic:
        k_enc, k_dec = jax.random.split(dropout_key)
    else:
        k_enc = k_dec = None
    enc = encode(
        params, cfg, input_ids, attention_mask,
        deterministic=deterministic, dropout_key=k_enc,
        pos_bias=pos_biases["enc"] if pos_biases else None,
    )
    dec_in = shift_right(labels, cfg)
    return decode(
        params, cfg, dec_in, enc, attention_mask,
        deterministic=deterministic, dropout_key=k_dec,
        self_pos_bias=pos_biases["dec_self"] if pos_biases else None,
    )


def count_params(params: PyTree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
