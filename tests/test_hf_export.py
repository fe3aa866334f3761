"""HF export roundtrip: our params -> save_pretrained dir -> transformers
load -> identical logits through both stacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import T5Config, forward_logits, init_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_export_roundtrip(tmp_path):
    from pacednegatives_tpu.models.hf_export import save_pretrained
    from pacednegatives_tpu.models.hf_import import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    cfg = T5Config(
        vocab_size=384, d_model=64, d_kv=16, d_ff=128, num_heads=4,
        num_layers=2, num_decoder_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        dropout_rate=0.0,
    )
    params = init_params(jax.random.key(0), cfg)
    out = str(tmp_path / "export")
    save_pretrained(params, cfg, out)

    hf = transformers.T5ForConditionalGeneration.from_pretrained(out)
    hf.eval()
    cfg2 = config_from_hf(hf.config)
    params2 = params_from_hf_state_dict(hf.state_dict(), cfg2)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 384, size=(2, 9)).astype(np.int32)
    labels = rng.integers(2, 384, size=(2, 2)).astype(np.int32)

    ours = np.asarray(forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(labels)))
    reimported = np.asarray(
        forward_logits(params2, cfg2, jnp.asarray(ids), jnp.asarray(labels))
    )
    np.testing.assert_allclose(reimported, ours, atol=1e-5, rtol=1e-5)

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            labels=torch.tensor(labels.astype(np.int64)),
        ).logits.numpy()
    np.testing.assert_allclose(theirs, ours, atol=3e-5, rtol=3e-5)
