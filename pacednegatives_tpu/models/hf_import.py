"""Import HuggingFace T5 checkpoints into our parameter pytree.

Used for (a) numerical parity tests against torch T5 and (b) loading real
pretrained t5-base/t5-small weights when a local checkpoint directory is
available (this environment has no network egress, so parity runs start from
an in-repo random init unless a checkpoint is mounted).

Only depends on torch/transformers lazily — the core framework never does.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from pacednegatives_tpu.models.t5 import T5Config


def config_from_hf(hf_config: Any) -> T5Config:
    return T5Config(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        d_kv=hf_config.d_kv,
        d_ff=hf_config.d_ff,
        num_heads=hf_config.num_heads,
        num_layers=hf_config.num_layers,
        num_decoder_layers=hf_config.num_decoder_layers,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hf_config, "relative_attention_max_distance", 128
        ),
        dropout_rate=hf_config.dropout_rate,
        layer_norm_epsilon=hf_config.layer_norm_epsilon,
        tie_word_embeddings=hf_config.tie_word_embeddings,
        gated_ffn=hf_config.feed_forward_proj.startswith("gated"),
        pad_token_id=hf_config.pad_token_id,
        decoder_start_token_id=hf_config.decoder_start_token_id,
    )


def _t(x) -> np.ndarray:
    # copy=True: tensor.numpy() SHARES the torch storage, and np.asarray of an
    # already-fp32 buffer is zero-copy too — without the copy, the returned
    # pytree silently tracks any subsequent in-place torch training (bit us in
    # tests that run a torch oracle loop on the same live model).
    return np.array(x.detach().cpu().numpy(), dtype=np.float32, copy=True)


def params_from_hf_state_dict(sd: Mapping[str, Any], cfg: T5Config) -> dict:
    """Map a torch T5ForConditionalGeneration state_dict to our pytree.

    HF linear layers store weight as (out, in); our params are (in, out), so
    every projection is transposed. Relative-attention bias is stored
    (num_buckets, heads) in both.
    """

    def attn(prefix: str, rel: bool) -> dict:
        p = {
            "q": _t(sd[f"{prefix}.q.weight"]).T,
            "k": _t(sd[f"{prefix}.k.weight"]).T,
            "v": _t(sd[f"{prefix}.v.weight"]).T,
            "o": _t(sd[f"{prefix}.o.weight"]).T,
        }
        if rel:
            p["rel_bias"] = _t(sd[f"{prefix}.relative_attention_bias.weight"])
        return p

    def mlp_params(prefix: str) -> dict:
        if cfg.gated_ffn:
            return {
                "wi_0": _t(sd[f"{prefix}.wi_0.weight"]).T,
                "wi_1": _t(sd[f"{prefix}.wi_1.weight"]).T,
                "wo": _t(sd[f"{prefix}.wo.weight"]).T,
            }
        return {
            "wi": _t(sd[f"{prefix}.wi.weight"]).T,
            "wo": _t(sd[f"{prefix}.wo.weight"]).T,
        }

    encoder: dict = {}
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}.layer"
        encoder[f"block_{i}"] = {
            "self_attn": attn(f"{b}.0.SelfAttention", rel=(i == 0)),
            "ln_self": {"scale": _t(sd[f"{b}.0.layer_norm.weight"])},
            "mlp": mlp_params(f"{b}.1.DenseReluDense"),
            "ln_mlp": {"scale": _t(sd[f"{b}.1.layer_norm.weight"])},
        }
    encoder["final_ln"] = {"scale": _t(sd["encoder.final_layer_norm.weight"])}

    decoder: dict = {}
    for i in range(cfg.num_decoder_layers):
        b = f"decoder.block.{i}.layer"
        decoder[f"block_{i}"] = {
            "self_attn": attn(f"{b}.0.SelfAttention", rel=(i == 0)),
            "ln_self": {"scale": _t(sd[f"{b}.0.layer_norm.weight"])},
            "cross_attn": attn(f"{b}.1.EncDecAttention", rel=False),
            "ln_cross": {"scale": _t(sd[f"{b}.1.layer_norm.weight"])},
            "mlp": mlp_params(f"{b}.2.DenseReluDense"),
            "ln_mlp": {"scale": _t(sd[f"{b}.2.layer_norm.weight"])},
        }
    decoder["final_ln"] = {"scale": _t(sd["decoder.final_layer_norm.weight"])}

    params = {
        "shared": {"embedding": _t(sd["shared.weight"])},
        "encoder": encoder,
        "decoder": decoder,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"embedding": _t(sd["lm_head.weight"])}
    return params


def load_hf_checkpoint(path: str):
    """Load a local HF T5 checkpoint directory -> (params, T5Config)."""
    from transformers import T5ForConditionalGeneration

    model = T5ForConditionalGeneration.from_pretrained(path)
    cfg = config_from_hf(model.config)
    return params_from_hf_state_dict(model.state_dict(), cfg), cfg
