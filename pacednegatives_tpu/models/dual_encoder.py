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
    mask: jax.Array,  # (N, L)
    batch_size: int = 256,
    normalize: bool = True,
) -> jax.Array:
    """Encode a whole token matrix in fixed-size batches under one jitted
    scan — this is the index-refresh primitive (double-bufferable against
    training because it is itself a single device program)."""
    N = tokens.shape[0]
    pad = (-N) % batch_size
    if pad:
        tokens = jnp.concatenate([tokens, jnp.zeros((pad, tokens.shape[1]), tokens.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, mask.shape[1]), mask.dtype)])
    nb = tokens.shape[0] // batch_size

    def body(_, chunk):
        t, m = chunk
        return None, embed(params, cfg, t, m, normalize)

    _, out = jax.lax.scan(
        body,
        None,
        (
            tokens.reshape(nb, batch_size, -1),
            mask.reshape(nb, batch_size, -1),
        ),
    )
    return out.reshape(nb * batch_size, -1)[:N]
