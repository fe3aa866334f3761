"""monoT5 relevance scoring head.

Parity with the reference's MonoT5Model.forward (distill/wrapper.py:34-38):
score = log_softmax over the (true, false) verbalizer-token logits at the
first decoder position, taking the 'true' component.

The default verbalizer ids below are the T5 sentencepiece ids for "true" and
"false" (reference: old/eta_bound.py:45-46 computes them via
``tokenizer.encode('true')[0]``). They are overridable because this framework
also supports in-repo-trained tokenizers (data/tokenizer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5

# t5 sentencepiece: tokenizer.encode('true')[0] == 1176, 'false' -> 6136.
VERBALIZER_TRUE = 1176
VERBALIZER_FALSE = 6136


def relevance_log_probs(
    first_token_logits: jax.Array,
    rel_id: int = VERBALIZER_TRUE,
    nrel_id: int = VERBALIZER_FALSE,
) -> jax.Array:
    """(B, vocab) first-position logits -> (B,) log P(true | {true,false})."""
    pair = first_token_logits[:, jnp.array([rel_id, nrel_id])]
    return jax.nn.log_softmax(pair, axis=-1)[:, 0]


def relevance_probs(
    first_token_logits: jax.Array,
    rel_id: int = VERBALIZER_TRUE,
    nrel_id: int = VERBALIZER_FALSE,
) -> jax.Array:
    """(B,) P(true); parity with check_probs softmax (old/levels.py:35-39)."""
    pair = first_token_logits[:, jnp.array([rel_id, nrel_id])]
    return jax.nn.softmax(pair, axis=-1)[:, 0]


def score_batch(
    params,
    cfg: t5.T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    rel_id: int = VERBALIZER_TRUE,
    nrel_id: int = VERBALIZER_FALSE,
) -> jax.Array:
    """Score (B, L) 'Query: .. Document: .. Relevant:' prompts -> (B,) scores.

    A single decode step (decoder input = [start token]); no generation loop
    is ever needed for monoT5 (SURVEY.md §7 item 2).
    """
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    enc = t5.encode(params, cfg, input_ids, attention_mask)
    B = input_ids.shape[0]
    dec_in = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    logits = t5.decode(params, cfg, dec_in, enc, attention_mask)
    return relevance_log_probs(logits[:, 0, :], rel_id, nrel_id)
