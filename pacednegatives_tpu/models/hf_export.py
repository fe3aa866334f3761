"""Export our parameter pytree as a HuggingFace T5 checkpoint directory.

Interop parity with the reference's ``model.save_pretrained(out_dir)``
(train/train_lce.py:103, old trainers): a user of the reference evaluates
saved models through ``pyterrier_t5.MonoT5ReRanker(model=dir)``; exporting
to the HF format lets our trained rerankers drop into that pipeline (and any
other transformers consumer). Exact inverse of models/hf_import.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pacednegatives_tpu.models.t5 import T5Config


def hf_config_from(cfg: T5Config) -> Any:
    import transformers

    return transformers.T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=cfg.dropout_rate,
        layer_norm_epsilon=cfg.layer_norm_epsilon,
        tie_word_embeddings=cfg.tie_word_embeddings,
        feed_forward_proj="gated-gelu" if cfg.gated_ffn else "relu",
        pad_token_id=cfg.pad_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
    )


def state_dict_from_params(params: Any, cfg: T5Config) -> dict:
    import torch

    if "blocks" in params["encoder"]:  # native stacked scan layout
        from pacednegatives_tpu.models.t5 import unstack_params

        params = unstack_params(params)

    t = lambda x: torch.tensor(np.asarray(x, dtype=np.float32))
    sd: dict = {"shared.weight": t(params["shared"]["embedding"])}

    def attn(prefix, p, rel):
        for k in ("q", "k", "v", "o"):
            sd[f"{prefix}.{k}.weight"] = t(p[k]).T.contiguous()
        if rel:
            sd[f"{prefix}.relative_attention_bias.weight"] = t(p["rel_bias"])

    def mlp(prefix, p):
        keys = ("wi_0", "wi_1", "wo") if cfg.gated_ffn else ("wi", "wo")
        for k in keys:
            sd[f"{prefix}.{k}.weight"] = t(p[k]).T.contiguous()

    for i in range(cfg.num_layers):
        blk = params["encoder"][f"block_{i}"]
        b = f"encoder.block.{i}.layer"
        attn(f"{b}.0.SelfAttention", blk["self_attn"], rel=(i == 0))
        sd[f"{b}.0.layer_norm.weight"] = t(blk["ln_self"]["scale"])
        mlp(f"{b}.1.DenseReluDense", blk["mlp"])
        sd[f"{b}.1.layer_norm.weight"] = t(blk["ln_mlp"]["scale"])
    sd["encoder.final_layer_norm.weight"] = t(
        params["encoder"]["final_ln"]["scale"]
    )

    for i in range(cfg.num_decoder_layers):
        blk = params["decoder"][f"block_{i}"]
        b = f"decoder.block.{i}.layer"
        attn(f"{b}.0.SelfAttention", blk["self_attn"], rel=(i == 0))
        sd[f"{b}.0.layer_norm.weight"] = t(blk["ln_self"]["scale"])
        attn(f"{b}.1.EncDecAttention", blk["cross_attn"], rel=False)
        sd[f"{b}.1.layer_norm.weight"] = t(blk["ln_cross"]["scale"])
        mlp(f"{b}.2.DenseReluDense", blk["mlp"])
        sd[f"{b}.2.layer_norm.weight"] = t(blk["ln_mlp"]["scale"])
    sd["decoder.final_layer_norm.weight"] = t(
        params["decoder"]["final_ln"]["scale"]
    )

    if cfg.tie_word_embeddings:
        sd["lm_head.weight"] = sd["shared.weight"]
        sd["encoder.embed_tokens.weight"] = sd["shared.weight"]
        sd["decoder.embed_tokens.weight"] = sd["shared.weight"]
    else:
        sd["lm_head.weight"] = t(params["lm_head"]["embedding"])
    return sd


def save_pretrained(params: Any, cfg: T5Config, path: str) -> None:
    """Write a transformers-loadable T5ForConditionalGeneration directory."""
    from transformers import T5ForConditionalGeneration

    model = T5ForConditionalGeneration(hf_config_from(cfg))
    missing, unexpected = model.load_state_dict(
        state_dict_from_params(params, cfg), strict=False
    )
    real_missing = [
        m for m in missing if "embed_tokens" not in m and m != "lm_head.weight"
    ]
    if real_missing or unexpected:
        raise ValueError(f"state dict mismatch: {real_missing} / {unexpected}")
    model.save_pretrained(path)
