"""Online mining tests: mined pools are difficulty-ordered, exclude the
positive, and the full loop trains with periodic refresh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import EtaController, InterpController
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from pacednegatives_tpu.train.online import (
    OnlineMiningConfig,
    OnlineMiningLoop,
    make_online_fused_step,
    make_refresh_fn,
)


@pytest.fixture(scope="module")
def setup():
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=8, seed=0)
    tok = HashTokenizer(vocab_size=512)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    triples = TripletStore.synthetic(corpus, n_pairs=32, n_neg=8, seed=1)
    dc = DeviceCorpus.build(store, triples)
    cfg = T5Config.tiny(vocab_size=512)
    params = init_params(jax.random.key(0), cfg)
    return tok, dc, cfg, params


def test_refresh_produces_normalized_embeddings(setup):
    tok, dc, cfg, params = setup
    mining = OnlineMiningConfig(pool_size=8, encode_batch=16)
    refresh = make_refresh_fn(dc, cfg, mining)
    emb = refresh(params)
    assert emb.shape == (64, cfg.d_model)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-4
    )


def test_online_step_runs_and_trains(setup):
    tok, dc, cfg, params = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    ctrl = InterpController(start=0.2, end=0.8, num_steps=20, batch_size=4)
    tx = make_optimizer(lr=1e-3, total_steps=12)
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    mining = OnlineMiningConfig(pool_size=8, encode_batch=16)
    fused = make_online_fused_step(dc, step, ctrl, cfg, mining, n_neg_per_example=2)
    refresh = make_refresh_fn(dc, cfg, mining)
    state = init_train_state(params, tx, ctrl.init())

    loop = OnlineMiningLoop(
        fused_step=fused, refresh_fn=refresh, num_pairs=dc.num_pairs,
        batch_size=4, chunk_size=3, refresh_every=4,
    )
    from pacednegatives_tpu.train import MetricWriter

    w = MetricWriter(None)
    state = loop.run(state, 12, w)
    assert int(state.step) == 12
    losses = [h["loss"] for h in w.history if "loss" in h]
    assert all(np.isfinite(l) for l in losses)


def test_online_quantized_index(setup):
    tok, dc, cfg, params = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    ctrl = InterpController(start=0.2, end=0.8, num_steps=20, batch_size=4)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    mining = OnlineMiningConfig(pool_size=8, encode_batch=16, quantize=True)
    fused = make_online_fused_step(dc, step, ctrl, cfg, mining, 2)
    refresh = make_refresh_fn(dc, cfg, mining)
    vals, scales = refresh(params)
    assert vals.dtype.name == "int8" and scales.shape == (64,)

    state = init_train_state(params, tx, ctrl.init())
    loop = OnlineMiningLoop(
        fused_step=fused, refresh_fn=refresh, num_pairs=dc.num_pairs,
        batch_size=4, chunk_size=2, refresh_every=4,
    )
    from pacednegatives_tpu.train import MetricWriter

    w = MetricWriter(None)
    state = loop.run(state, 8, w)
    assert int(state.step) == 8
    assert all(np.isfinite(h["loss"]) for h in w.history if "loss" in h)


def test_mined_pools_exclude_positive_and_order(setup):
    """Drive the mining internals directly: hardest (pool[-1]) must be the
    max-inner-product doc (excluding the positive)."""
    tok, dc, cfg, params = setup
    from pacednegatives_tpu.models.dual_encoder import embed, encode_corpus

    emb = encode_corpus(params, cfg, dc.d_tokens, dc.d_mask, batch_size=16)
    pair_idx = jnp.arange(4)
    q_rows = dc.query_rows[pair_idx]
    pos_rows = np.asarray(dc.pos_rows[pair_idx])
    q_emb = embed(params, cfg, dc.q_tokens[q_rows].astype(jnp.int32))

    # replicate the kernel's mining path
    from pacednegatives_tpu.ops.mips import mips_topk_exact

    k = 9
    _, idx = mips_topk_exact(q_emb, emb, k)
    idx = np.asarray(idx)

    scores = np.asarray(q_emb) @ np.asarray(emb).T
    for b in range(4):
        assert idx[b, 0] == scores[b].argmax()

    # now through the fused step machinery: pools exclude the positive
    ctrl = InterpController(start=1.0, end=1.0, num_steps=1)  # hardest only
    tx = make_optimizer(lr=1e-3, total_steps=2)
    captured = {}

    def fake_step(state, batch):
        captured["neg_ids"] = batch["neg_ids"]
        return state, {"loss": jnp.float32(0)}

    mining = OnlineMiningConfig(pool_size=8, exclude_positive=True)
    fused = make_online_fused_step(dc, fake_step, ctrl, cfg, mining, 1)
    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tx, ctrl.init()
    )
    (state, _), _ = fused((state, emb), pair_idx)
    # at difficulty 1.0 the sampled negative is near the hard end; verify the
    # sampled docs are never the positives
    neg_ids = np.asarray(captured["neg_ids"])
    t = dc  # doc segment beginning
    d_start = dc.prefix.shape[0] + dc.q_tokens.shape[1] + dc.mid.shape[0]
    d_end = d_start + dc.d_tokens.shape[1]
    d_tok = np.asarray(dc.d_tokens)
    for b in range(4):
        assert not np.array_equal(
            neg_ids[b, d_start:d_end], d_tok[pos_rows[b]]
        )


def test_sliced_refresh_matches_monolithic(setup):
    """refresh_rows_per_call slicing is exact: per-row quantization makes
    slice boundaries invisible (the 1M-doc path uses 262144-row slices to
    bound single-execution device time)."""
    tok, dc, cfg, params = setup
    whole = OnlineMiningConfig(pool_size=8, encode_batch=16, quantize=True)
    sliced = OnlineMiningConfig(
        pool_size=8, encode_batch=16, quantize=True, refresh_rows_per_call=24
    )
    v0, s0 = make_refresh_fn(dc, cfg, whole)(params)
    v1, s1 = make_refresh_fn(dc, cfg, sliced)(params)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


def test_corpus_threads_as_argument_not_hlo_constant(setup):
    """When the corpus crosses the jit boundary as an argument (DeviceCorpus
    pytree), the lowered module must NOT embed the token matrices as
    literals — that is the MS MARCO-scale failure mode (multi-hundred-MB
    compile payloads). The closure form bakes them in; the argument form
    must stay small."""
    tok, _, cfg, params = setup
    from pacednegatives_tpu.train import make_fused_step

    # corpus large enough that baked-in literals dominate proto-size noise
    big = TextCorpus.synthetic(num_docs=512, num_queries=8, seed=0)
    store = TokenizedStore.build(big, tok, max_q_tokens=6, max_d_tokens=64)
    triples = TripletStore.synthetic(big, n_pairs=32, n_neg=8, seed=1)
    dc = DeviceCorpus.build(store, triples)

    ctrl = InterpController(start=0.2, end=0.8, num_steps=20, batch_size=4)
    tx = make_optimizer(lr=1e-3, total_steps=12)
    step = make_train_step(
        cfg, ctrl, tx, loss="pair", rel_id=tok.true_id, nrel_id=tok.false_id
    )
    fused = make_fused_step(dc, step, ctrl, loss="pair")
    state = init_train_state(params, tx, ctrl.init())
    idx = jnp.zeros((2, 4), jnp.int32)

    as_arg = jax.jit(
        lambda s, i, corp: jax.lax.scan(
            lambda ss, ii: fused(ss, ii, corp), s, i
        )
    ).lower(state, idx, dc)
    closed = jax.jit(
        lambda s, i: jax.lax.scan(fused, s, i)
    ).lower(state, idx)
    # .as_text() elides large literals, so compare the serialized module
    # protos: the closure form embeds the corpus matrices as constants
    # (premise), the argument form must not (its proto stays smaller by at
    # least the token bytes).
    size = lambda l: len(
        l.compiler_ir(dialect="hlo").as_serialized_hlo_module_proto()
    )
    corpus_bytes = np.asarray(dc.d_tokens).nbytes
    assert size(closed) - size(as_arg) >= corpus_bytes // 2


def test_index_checkpoint_resume_bit_exact(setup, tmp_path):
    """checkpoint_index=True: a run interrupted at a checkpoint boundary and
    resumed from it must reproduce the uninterrupted run's losses exactly —
    including when the boundary coincides with a scheduled refresh (the
    snapshot is written post-refresh). Also pins the documented divergence
    of the default path: without the snapshot, the resumed run re-encodes
    the index from restored params mid-cadence and CAN differ."""
    from pacednegatives_tpu.train import MetricWriter
    from pacednegatives_tpu.train.loop import restore_checkpoint

    tok, dc, cfg, params0 = setup

    def mk(seed_params):
        params = jax.tree_util.tree_map(jnp.copy, seed_params)
        ctrl = InterpController(start=0.2, end=0.8, num_steps=20, batch_size=4)
        tx = make_optimizer(lr=1e-2, total_steps=8)
        step = make_train_step(
            cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
            rel_id=tok.true_id, nrel_id=tok.false_id,
        )
        mining = OnlineMiningConfig(pool_size=8, encode_batch=16)
        fused = make_online_fused_step(dc, step, ctrl, cfg, mining, 2)
        refresh = make_refresh_fn(dc, cfg, mining)
        state = init_train_state(params, tx, ctrl.init())
        return state, fused, refresh

    def loop_for(fused, refresh, ckpt_dir, checkpoint_index):
        return OnlineMiningLoop(
            fused_step=fused, refresh_fn=refresh, num_pairs=dc.num_pairs,
            batch_size=4, chunk_size=2, refresh_every=4, log_mode="all",
            checkpoint_dir=ckpt_dir, checkpoint_every_steps=4,
            checkpoint_index=checkpoint_index,
        )

    # --- uninterrupted run: 8 steps, checkpoint+index snapshot at step 4
    state, fused, refresh = mk(params0)
    w_full = MetricWriter(None)
    dir_a = str(tmp_path / "a")
    loop_for(fused, refresh, dir_a, True).run(state, 8, w_full)
    full = {h["step"]: h["loss"] for h in w_full.history if "loss" in h}

    # --- resume from the step-4 checkpoint WITH the index snapshot
    state_b, fused_b, refresh_b = mk(params0)
    restored = restore_checkpoint(f"{dir_a}/step_4", state_b)
    w_res = MetricWriter(None)
    loop_for(fused_b, refresh_b, dir_a, True).run(restored, 8, w_res)
    res = {h["step"]: h["loss"] for h in w_res.history if "loss" in h}
    assert sorted(res) == [5, 6, 7, 8]
    for s in (5, 6, 7, 8):
        np.testing.assert_allclose(res[s], full[s], rtol=0, atol=0,
                                   err_msg=f"step {s}")
