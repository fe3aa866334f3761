"""int8 W8A8 scoring forward (models/quant.py) vs the bf16 scorer.

The int8 path exists for rank-fidelity scoring only (docs/north_star.md):
tests pin (a) absolute score closeness and Spearman/top-k agreement with
models.monot5.score_batch on the same params, (b) the int8_linear
primitive against an fp32 matmul within quantization-error bounds,
(c) both param layouts (separate q/k/v and fused qkv), and (d) the
scored-pool step running end-to-end with score_dtype='int8'.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import (
    T5Config,
    init_params,
    quantize_scoring_params,
    score_batch,
    score_batch_int8,
)
from pacednegatives_tpu.models.quant import _quantize_weight, int8_linear


def _setup(n_docs=32):
    cfg = dataclasses.replace(T5Config.tiny(vocab_size=256),
                              dtype=jnp.bfloat16)
    tok = HashTokenizer(vocab_size=256)
    corpus = TextCorpus.synthetic(num_docs=n_docs, num_queries=4, seed=0)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=24)
    params = init_params(jax.random.key(0), cfg)
    return cfg, tok, corpus, store, params


def test_int8_linear_matches_fp32_within_quant_error():
    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (4, 10, 64)) * 2.0
    w = jax.random.normal(k2, (64, 96)) * 0.1
    got = int8_linear(x, _quantize_weight(w))
    ref = jnp.einsum("bld,do->blo", x, w)
    # two symmetric int8 roundings: relative error ~1/127 each per operand
    err = np.abs(np.asarray(got - ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.03


def test_scores_match_bf16_path_rank_and_value():
    cfg, tok, corpus, store, params = _setup()
    q = np.zeros(32, np.int32)
    d = np.arange(32, dtype=np.int32)
    ids, mask = store.assemble_host(q, d)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    sb = np.asarray(score_batch(params, cfg, ids, mask,
                                rel_id=tok.true_id, nrel_id=tok.false_id))
    qp = quantize_scoring_params(params, cfg)
    si = np.asarray(score_batch_int8(qp, cfg, ids, mask,
                                     rel_id=tok.true_id,
                                     nrel_id=tok.false_id))
    # measured on this corpus: max |diff| ~0.006 vs score std ~0.047
    assert np.abs(sb - si).max() < 0.03
    # rank fidelity — what the scored-pool selector actually consumes
    rb, ri = np.argsort(np.argsort(sb)), np.argsort(np.argsort(si))
    n = len(sb)
    spearman = 1 - 6 * np.sum((rb - ri) ** 2) / (n * (n**2 - 1))
    assert spearman > 0.95, spearman
    top8 = len(set(np.argsort(sb)[-8:]) & set(np.argsort(si)[-8:]))
    assert top8 >= 7, top8


def test_fused_qkv_layout_matches_separate():
    from pacednegatives_tpu.models import t5

    cfg, tok, corpus, store, params = _setup()
    ids, mask = store.assemble_host(np.zeros(4, np.int32),
                                    np.arange(4, dtype=np.int32))
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    qp_sep = quantize_scoring_params(params, cfg)
    qp_fused = quantize_scoring_params(
        t5.fuse_attention_params(params), cfg
    )
    a = np.asarray(score_batch_int8(qp_sep, cfg, ids, mask,
                                    rel_id=tok.true_id,
                                    nrel_id=tok.false_id))
    b = np.asarray(score_batch_int8(qp_fused, cfg, ids, mask,
                                    rel_id=tok.true_id,
                                    nrel_id=tok.false_id))
    # per-column scales are identical across layouts; only op order differs
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_scored_pool_step_with_int8_scoring():
    from pacednegatives_tpu.curriculum.interp import InterpController
    from pacednegatives_tpu.train import (
        init_train_state,
        make_optimizer,
        make_scored_pool_step,
        make_train_step,
    )

    cfg, tok, corpus, store, params = _setup(n_docs=64)
    triples = TripletStore.synthetic(corpus, n_pairs=6, n_neg=12, seed=1)
    dc = DeviceCorpus.build(store, triples)
    ctrl = InterpController(start=0.5, end=0.5, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, score_dtype="int8",
    )
    state = init_train_state(params, tx, ctrl.init())
    new_state, m = jax.jit(fused)(state, jnp.arange(4, dtype=jnp.int32))
    assert np.isfinite(float(m["loss"]))
    assert float(m["neg_scored"]) == 4 * 8 + 4 * 2
    with pytest.raises(ValueError):
        make_scored_pool_step(
            dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
            rel_id=tok.true_id, nrel_id=tok.false_id, score_dtype="fp8",
        )


def test_bf16_stream_rank_fidelity():
    """stream_dtype=bf16 (the HBM-traffic variant) must preserve the rank
    contract vs the bf16 scorer, within a slightly wider absolute band
    (bf16 residual rounding on top of the two int8 quantizations)."""
    cfg, tok, corpus, store, params = _setup()
    q = np.zeros(32, np.int32)
    d = np.arange(32, dtype=np.int32)
    ids, mask = store.assemble_host(q, d)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    sb = np.asarray(score_batch(params, cfg, ids, mask,
                                rel_id=tok.true_id, nrel_id=tok.false_id))
    qp = quantize_scoring_params(params, cfg)
    si = np.asarray(score_batch_int8(qp, cfg, ids, mask,
                                     rel_id=tok.true_id,
                                     nrel_id=tok.false_id,
                                     stream_dtype=jnp.bfloat16))
    assert np.abs(sb - si).max() < 0.05
    rb, ri = np.argsort(np.argsort(sb)), np.argsort(np.argsort(si))
    n = len(sb)
    spearman = 1 - 6 * np.sum((rb - ri) ** 2) / (n * (n**2 - 1))
    assert spearman > 0.9, spearman
    top8 = len(set(np.argsort(sb)[-8:]) & set(np.argsort(si)[-8:]))
    assert top8 >= 6, top8


def test_scored_pool_step_with_int8_bf16_scoring():
    from pacednegatives_tpu.curriculum.interp import InterpController
    from pacednegatives_tpu.train import (
        init_train_state,
        make_optimizer,
        make_scored_pool_step,
        make_train_step,
    )

    cfg, tok, corpus, store, params = _setup(n_docs=64)
    triples = TripletStore.synthetic(corpus, n_pairs=6, n_neg=12, seed=1)
    dc = DeviceCorpus.build(store, triples)
    ctrl = InterpController(start=0.5, end=0.5, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, score_dtype="int8_bf16",
    )
    state = init_train_state(params, tx, ctrl.init())
    _, m = jax.jit(fused)(state, jnp.arange(4, dtype=jnp.int32))
    assert np.isfinite(float(m["loss"]))
    assert float(m["neg_scored"]) == 4 * 8 + 4 * 2
