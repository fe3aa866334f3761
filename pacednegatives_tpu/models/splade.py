"""SPLADE-style learned-sparse encoder over the T5 encoder stack.

Closes the compute_all_splade parity gap (reference
utilities/compute_all_splade.py:28-30 builds negative pools with a SPLADE
query encoder over a PISA *quantized* impact index; round-1 substituted a
dense dual encoder). The classic SPLADE formulation: project every encoder
position to vocabulary space through the (tied) embedding — the same matmul
the LM head performs — then aggregate

    w_v = max_over_positions log(1 + relu(logit_{pos,v}))

masked to real tokens. log1p saturates high activations, relu gates, max
pooling keeps the strongest evidence per term; the result is a sparse
vocab-space vector whose nonzeros act as weighted expansion terms. Top-k
sparsification bounds the index size (SPLADE's FLOPS regularizer at
inference time, made explicit).

TPU mapping: the position->vocab projection is one big MXU matmul; the
(B, L, V) logits tensor never materializes — positions are processed in
chunks under lax.scan with a running per-term max, so peak memory is
O(B * chunk * V) + the (B, V) accumulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5


def splade_activations(
    params,
    cfg: t5.T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    pos_chunk: int = 32,
) -> jax.Array:
    """(B, L) token ids -> (B, V) fp32 sparse term activations."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    h = t5.encode(params, cfg, input_ids, attention_mask)  # (B, L, D)
    emb = (
        params["shared"]["embedding"]
        if cfg.tie_word_embeddings
        else params["lm_head"]["embedding"]
    ).astype(cfg.dtype)
    scale = cfg.d_model**-0.5 if cfg.tie_word_embeddings else 1.0

    B, L, _ = h.shape
    C = min(pos_chunk, L)
    pad = (-L) % C
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad)))
    nc = h.shape[1] // C
    h_c = h.reshape(B, nc, C, -1).transpose(1, 0, 2, 3)
    m_c = attention_mask.reshape(B, nc, C).transpose(1, 0, 2)

    def body(acc, chunk):
        hc, mc = chunk
        logits = jnp.einsum(
            "bcd,vd->bcv", hc * scale, emb, preferred_element_type=jnp.float32
        )
        act = jnp.log1p(jax.nn.relu(logits))
        act = act * mc[..., None].astype(act.dtype)  # mask padded positions
        return jnp.maximum(acc, act.max(axis=1)), None

    init = jnp.zeros((B, emb.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, init, (h_c, m_c))
    return acc


def splade_topk(
    params,
    cfg: t5.T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    k: int = 128,
    pos_chunk: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """-> (weights (B, k) fp32 desc, term_ids (B, k) int32). Entries with
    weight 0 are inactive terms (callers must treat them as absent)."""
    act = splade_activations(params, cfg, input_ids, attention_mask, pos_chunk)
    w, idx = jax.lax.top_k(act, k)
    return w, idx.astype(jnp.int32)


def encode_corpus_sparse(
    params,
    cfg: t5.T5Config,
    tokens: jax.Array,
    mask: jax.Array,
    k: int = 128,
    batch_size: int = 64,
    pos_chunk: int = 32,
):
    """Encode a whole token matrix to top-k sparse vectors in fixed-size
    batches under one jitted scan (mirror of dual_encoder.encode_corpus)."""
    N = tokens.shape[0]
    pad = (-N) % batch_size
    if pad:
        tokens = jnp.concatenate(
            [tokens, jnp.zeros((pad, tokens.shape[1]), tokens.dtype)]
        )
        mask = jnp.concatenate([mask, jnp.zeros((pad, mask.shape[1]), mask.dtype)])
    nb = tokens.shape[0] // batch_size

    def body(_, chunk):
        t, m = chunk
        return None, splade_topk(params, cfg, t, m, k=k, pos_chunk=pos_chunk)

    _, (w, idx) = jax.lax.scan(
        body,
        None,
        (
            tokens.reshape(nb, batch_size, -1),
            mask.reshape(nb, batch_size, -1),
        ),
    )
    V = w.shape[-1]
    return w.reshape(-1, V)[:N], idx.reshape(-1, V)[:N]
