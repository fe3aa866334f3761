"""Numerical parity of our from-scratch T5 against torch T5ForConditionalGeneration.

A randomly-initialized torch T5 (built from a local T5Config — no network) is
converted through models/hf_import.py; logits must match to fp32 tolerance.
This pins the architecture exactly (RMS norm, unscaled attention, relative
position buckets, tied-embedding logit scaling, shift-right semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.hf_import import config_from_hf, params_from_hf_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.T5Config(
        vocab_size=384,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ours(hf_model):
    cfg = config_from_hf(hf_model.config)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg)
    return params, cfg


def _batch(vocab, rng):
    input_ids = rng.integers(2, vocab, size=(3, 17)).astype(np.int32)
    input_ids[0, 12:] = 0  # padding
    input_ids[2, 5:] = 0
    labels = rng.integers(2, vocab, size=(3, 2)).astype(np.int32)
    return input_ids, labels


def test_encoder_parity(hf_model, ours):
    params, cfg = ours
    rng = np.random.default_rng(1)
    input_ids, _ = _batch(cfg.vocab_size, rng)
    mask = (input_ids != 0).astype(np.int32)

    with torch.no_grad():
        ref = hf_model.encoder(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(t5.encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask)))
    # Compare only non-pad positions: HF applies the padding mask to scores so
    # padded query rows differ, but they never influence real positions.
    np.testing.assert_allclose(got[mask == 1], ref[mask == 1], atol=2e-5, rtol=2e-5)


def test_seq2seq_logits_parity(hf_model, ours):
    params, cfg = ours
    rng = np.random.default_rng(2)
    input_ids, labels = _batch(cfg.vocab_size, rng)
    mask = (input_ids != 0).astype(np.int32)

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            labels=torch.tensor(labels.astype(np.int64)),
        ).logits.numpy()

    got = np.asarray(
        t5.forward_logits(params, cfg, jnp.asarray(input_ids), jnp.asarray(labels))
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_shift_right_matches_hf(ours):
    params, cfg = ours
    labels = jnp.array([[5, 6, -100], [7, -100, -100]], jnp.int32)
    shifted = t5.shift_right(labels, cfg)
    np.testing.assert_array_equal(
        np.asarray(shifted), np.array([[0, 5, 6], [0, 7, 0]])
    )


def test_gated_ffn_parity():
    """T5 v1.1 gated-GELU FFN path vs torch (separate tiny model)."""
    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=1,
        num_decoder_layers=1, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", decoder_start_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.eval()
    cfg = config_from_hf(model.config)
    assert cfg.gated_ffn and not cfg.tie_word_embeddings
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    ids = rng.integers(2, 256, size=(2, 7)).astype(np.int32)
    labels = rng.integers(2, 256, size=(2, 2)).astype(np.int32)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            labels=torch.tensor(labels.astype(np.int64)),
        ).logits.numpy()
    got = np.asarray(
        t5.forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(labels))
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_jit_and_grad_run(ours):
    params, cfg = ours
    rng = np.random.default_rng(3)
    input_ids, labels = _batch(cfg.vocab_size, rng)

    def loss_fn(p):
        logits = t5.forward_logits(p, cfg, jnp.asarray(input_ids), jnp.asarray(labels))
        onehot = jax.nn.one_hot(labels, cfg.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
