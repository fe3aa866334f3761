"""int8 (W8A8 dynamic) monoT5 scoring forward — the no-grad throughput lever.

Why this exists (docs/north_star.md §2): the ≥10× negatives-scored/sec
target is arithmetically out of reach at matched (bf16) precision — the
all-scoring asymptote is ~9×. The scoring pass needs rank fidelity, not
gradients, and the v5e MXU's int8 matmul peak is 2× its bf16 peak
(394 vs 197 T-ops/s), so quantizing the *no-grad* forward is the
structural lever that clears the bar. The reference has no analogue: it
pays fp32-equivalent torch forwards for everything, including its two
no-grad meta forwards (lceT5.py:131-135).

Scheme — standard dynamic W8A8:
- weights: per-OUTPUT-channel symmetric int8 (scale = max|W[:, o]| / 127),
  quantized once per parameter snapshot (``quantize_scoring_params``);
- activations: per-token symmetric int8, quantized dynamically at each
  linear's input (scale = max|x| over the feature axis / 127);
- every projection / FFN matmul runs int8 × int8 → int32 on the MXU
  (``preferred_element_type=int32``), dequantized by sx · sw;
- everything precision-sensitive stays exact: embeddings, RMS-norm (fp32
  variance), softmax (fp32), the QKᵀ / PV attention GEMMs (bf16 — <1% of
  FLOPs at monoT5 shapes), position-bias tables, and the 2-logit
  verbalizer head.

The decoder runs exactly ONE step (monoT5 scores at the first decode
position, reference distill/wrapper.py:34-38), where self-attention over a
single position reduces to softmax over one key — identically the value
projection — so the decoder costs three small GEMM groups, and the LM head
only needs the two verbalizer rows of the (tied) embedding
(log-softmax is over the {true, false} pair, models/monot5.py).

Accuracy contract: scores drift by O(1%) absolute in log-prob but the
RANKING the scored-pool selector consumes is preserved —
tests/test_quant.py pins Spearman rank correlation and top-k overlap
against the bf16 scorer on the synthetic corpus. Not used for training
math anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.monot5 import (
    VERBALIZER_FALSE,
    VERBALIZER_TRUE,
)

_EPS = 1e-8


def _quantize_weight(w: jax.Array) -> dict:
    """(d, o) float weight -> int8 + per-output-channel fp32 scale."""
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"w": q, "s": s}


def int8_linear(x: jax.Array, qw: dict, out_dtype=jnp.float32) -> jax.Array:
    """Dynamic per-token activation quant + int8 MXU matmul.

    x (..., d) any float; qw from _quantize_weight. The int32 accumulator
    is exact; the only rounding is the two int8 quantizations (plus the
    out_dtype cast — bf16 out halves the inter-layer HBM traffic and
    leaves ranks intact; the scale multiply happens in fp32 either way).
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS
    ) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw["w"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * qw["s"]).astype(out_dtype)


def _layer_blocks(stack: dict, n: int) -> list:
    if "blocks" in stack:
        return [
            jax.tree_util.tree_map(lambda a, i=i: a[i], stack["blocks"])
            for i in range(n)
        ]
    return [stack[f"block_{i}"] for i in range(n)]


def _quantize_attn(p: dict) -> dict:
    # three layouts (t5.fuse_attention_params): separate q/k/v, fused
    # self-attn "qkv", fused cross-attn q + "kv"
    src = {k: p[k] for k in ("q", "k", "v", "qkv", "kv") if k in p}
    out = {k: _quantize_weight(v) for k, v in src.items()}
    out["o"] = _quantize_weight(p["o"])
    return out


def _quantize_mlp(p: dict) -> dict:
    return {k: _quantize_weight(v) for k, v in p.items()}


def quantize_scoring_params(params, cfg: t5.T5Config) -> dict:
    """Quantize every matmul weight of the scoring forward; keep
    embeddings / norms / rel-bias tables exact. Pure jnp — safe to call
    inside jit (e.g. per-step on live training params)."""
    enc_blocks = _layer_blocks(params["encoder"], cfg.num_layers)
    dec_blocks = _layer_blocks(params["decoder"], cfg.num_decoder_layers)

    def enc_block(b):
        return {
            "self_attn": _quantize_attn(b["self_attn"]),
            "mlp": _quantize_mlp(b["mlp"]),
            "ln_self": b["ln_self"],
            "ln_mlp": b["ln_mlp"],
        }

    def dec_block(b):
        return {
            "self_attn": _quantize_attn(b["self_attn"]),
            "cross_attn": _quantize_attn(b["cross_attn"]),
            "mlp": _quantize_mlp(b["mlp"]),
            "ln_self": b["ln_self"],
            "ln_cross": b["ln_cross"],
            "ln_mlp": b["ln_mlp"],
        }

    q = {
        "shared": params["shared"],
        "enc_blocks": [enc_block(b) for b in enc_blocks],
        "dec_blocks": [dec_block(b) for b in dec_blocks],
        "enc_rel_bias": t5._rel_bias(params["encoder"]),
        "dec_rel_bias": t5._rel_bias(params["decoder"]),
        "enc_final_ln": params["encoder"]["final_ln"],
        "dec_final_ln": params["decoder"]["final_ln"],
    }
    if not cfg.tie_word_embeddings:
        q["lm_head"] = params["lm_head"]
    return q


def _proj_qkv(qp: dict, x_q, x_kv, H: int, dk: int, sd=jnp.float32):
    """int8 q/k/v projections -> (B, L, H, dk) in stream dtype sd each."""
    inner = H * dk

    def heads(y, L):
        return y.reshape(y.shape[0], L, H, dk)

    col = lambda q, lo, hi: {"w": q["w"][:, lo:hi], "s": q["s"][:, lo:hi]}
    if "qkv" in qp:
        # fused self-attn layout (t5.fuse_attention_params): [q | k | v]
        yq = int8_linear(x_q, col(qp["qkv"], 0, inner), sd)
        yk = int8_linear(x_kv, col(qp["qkv"], inner, 2 * inner), sd)
        yv = int8_linear(x_kv, col(qp["qkv"], 2 * inner, 3 * inner), sd)
    elif "kv" in qp:
        # fused cross-attn layout: separate q, [k | v]
        yq = int8_linear(x_q, qp["q"], sd)
        yk = int8_linear(x_kv, col(qp["kv"], 0, inner), sd)
        yv = int8_linear(x_kv, col(qp["kv"], inner, 2 * inner), sd)
    else:
        yq = int8_linear(x_q, qp["q"], sd)
        yk = int8_linear(x_kv, qp["k"], sd)
        yv = int8_linear(x_kv, qp["v"], sd)
    return (heads(yq, x_q.shape[1]), heads(yk, x_kv.shape[1]),
            heads(yv, x_kv.shape[1]))


def _attention_int8(qp, x_q, x_kv, bias, cfg: t5.T5Config, sd=jnp.float32):
    """T5 attention (unscaled scores + additive bias) with int8
    projections; the score/AV GEMMs run bf16 (<1% of FLOPs)."""
    H, dk = cfg.num_heads, cfg.d_kv
    q, k, v = _proj_qkv(qp, x_q, x_kv, H, dk, sd)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return int8_linear(o.reshape(o.shape[0], o.shape[1], H * dk), qp["o"], sd)


def _mlp_int8(qp, cfg: t5.T5Config, x, sd=jnp.float32):
    if cfg.gated_ffn:
        h = jax.nn.gelu(int8_linear(x, qp["wi_0"], sd), approximate=True) \
            * int8_linear(x, qp["wi_1"], sd)
    else:
        h = jax.nn.relu(int8_linear(x, qp["wi"], sd))
    return int8_linear(h, qp["wo"], sd)


def score_batch_int8(
    qparams: dict,
    cfg: t5.T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    rel_id: int = VERBALIZER_TRUE,
    nrel_id: int = VERBALIZER_FALSE,
    # dtype of the inter-layer residual stream / activations. fp32 is the
    # original conservative choice; bf16 halves the forward's HBM traffic
    # (quantization scales and norms stay fp32 either way) — the rank
    # fidelity of both is pinned in tests/test_quant.py.
    stream_dtype=jnp.float32,
) -> jax.Array:
    """(B, L) prompts -> (B,) log P(true | {true, false}); int8 compute.

    Same contract as models.monot5.score_batch on the bf16 path (one
    teacher-forced decode step), with qparams from
    quantize_scoring_params.
    """
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    B, L = input_ids.shape
    eps = cfg.layer_norm_epsilon
    f32 = jnp.float32
    sd = stream_dtype

    emb = qparams["shared"]["embedding"].astype(f32)
    x = emb[input_ids].astype(sd)

    pos = t5.compute_position_bias(
        qparams["enc_rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = pos + t5._padding_bias(attention_mask)

    for blk in qparams["enc_blocks"]:
        h = t5.rms_norm(x, blk["ln_self"]["scale"], eps, sd)
        x = x + _attention_int8(blk["self_attn"], h, h, bias, cfg, sd)
        h = t5.rms_norm(x, blk["ln_mlp"]["scale"], eps, sd)
        x = x + _mlp_int8(blk["mlp"], cfg, h, sd)
    enc_h = t5.rms_norm(x, qparams["enc_final_ln"]["scale"], eps, sd)

    # --- one decoder step at position 0 -----------------------------------
    d = emb[jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)].astype(sd)
    cross_bias = t5._padding_bias(attention_mask)
    for blk in qparams["dec_blocks"]:
        # self-attention over a single position: softmax over one key is 1
        # regardless of bias, so attn(x) == o_proj(v_proj(x)) exactly
        h = t5.rms_norm(d, blk["ln_self"]["scale"], eps, sd)
        sa = blk["self_attn"]
        if "qkv" in sa:
            inner = cfg.num_heads * cfg.d_kv
            v = int8_linear(h, {"w": sa["qkv"]["w"][:, 2 * inner:],
                                "s": sa["qkv"]["s"][:, 2 * inner:]}, sd)
        else:
            v = int8_linear(h, sa["v"], sd)
        d = d + int8_linear(v, sa["o"], sd)
        h = t5.rms_norm(d, blk["ln_cross"]["scale"], eps, sd)
        d = d + _attention_int8(blk["cross_attn"], h, enc_h, cross_bias, cfg,
                                sd)
        h = t5.rms_norm(d, blk["ln_mlp"]["scale"], eps, sd)
        d = d + _mlp_int8(blk["mlp"], cfg, h, sd)
    d = t5.rms_norm(d, qparams["dec_final_ln"]["scale"], eps, f32)

    # 2-row verbalizer head: log-softmax is over the {true, false} pair
    # only (monot5.relevance_log_probs), so the full (V, D) GEMM is never
    # needed — exact fp32 at negligible cost.
    rows = jnp.array([rel_id, nrel_id])
    if cfg.tie_word_embeddings:
        head = emb[rows]  # (2, D)
        d = d * (cfg.d_model**-0.5)
    else:
        head = qparams["lm_head"]["embedding"].astype(f32)[rows]
    pair = jnp.einsum("bld,vd->blv", d, head)[:, 0, :]
    return jax.nn.log_softmax(pair, axis=-1)[:, 0]
