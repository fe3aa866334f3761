"""Dual-encoder embeddings from the T5 encoder stack.

The reference has no dense retriever — negative pools come from external
PISA/Terrier BM25 (SURVEY.md §2.7). The TPU-native online miner needs
embeddings; the natural choice is the reranker's own encoder with masked
mean pooling (shares weights with the model being trained, so pools track
the current model — and refreshing the index is just re-encoding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5


def embed(
    params,
    cfg: t5.T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    normalize: bool = True,
) -> jax.Array:
    """(B, L) token ids -> (B, D) pooled embeddings (fp32)."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    h = t5.encode(params, cfg, input_ids, attention_mask)  # (B, L, D)
    m = attention_mask[..., None].astype(h.dtype)
    pooled = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    pooled = pooled.astype(jnp.float32)
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6
        )
    return pooled


def encode_corpus(
    params,
    cfg: t5.T5Config,
    tokens: jax.Array,  # (N, L)
    mask: jax.Array | None,  # (N, L); None derives (tokens != pad_id)
    batch_size: int = 256,
    normalize: bool = True,
    pad_id: int | None = None,
) -> jax.Array:
    """Encode a whole token matrix in fixed-size batches under one jitted
    scan — this is the index-refresh primitive (double-bufferable against
    training because it is itself a single device program). With mask=None
    the padding mask is derived per batch inside the scan, so no (N, L)
    mask matrix ever exists in HBM."""
    N, L = tokens.shape
    pad = (-N) % batch_size
    if pad:
        tokens = jnp.concatenate([tokens, jnp.zeros((pad, L), tokens.dtype)])
        if mask is not None:
            mask = jnp.concatenate([mask, jnp.zeros((pad, L), mask.dtype)])
    nb = tokens.shape[0] // batch_size
    pad_tok = cfg.pad_token_id if pad_id is None else pad_id

    def body(_, chunk):
        t, m = chunk
        t = t.astype(jnp.int32)
        if m is None:
            m = (t != pad_tok).astype(jnp.int32)
        return None, embed(params, cfg, t, m, normalize)

    xs = (
        tokens.reshape(nb, batch_size, L),
        mask.reshape(nb, batch_size, L) if mask is not None else None,
    )
    _, out = jax.lax.scan(body, None, xs)
    return out.reshape(nb * batch_size, -1)[:N]
