"""Model-in-the-loop negative selection (train/scored_pool.py).

The online analogue of reference util.py:9-18 adhocRestructure: every step
scores a candidate subsample of the static pool with the cross-encoder
(no-grad) and curriculum-samples the training negatives from the MODEL
order. Tests pin (a) the selection semantics — at difficulty ~1 the step
trains on the candidates the model scores HARDEST, at ~0 the easiest —
(b) that the scores driving selection equal a direct score_batch call,
(c) that the fused step trains (finite loss, params move) and is
scan/jit-compatible, and (d) the metric contract (neg_scored count).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import EtaController
from pacednegatives_tpu.curriculum.interp import InterpController
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.models.monot5 import score_batch
from pacednegatives_tpu.train import (
    init_train_state,
    make_optimizer,
    make_scored_pool_step,
    make_train_step,
)
from pacednegatives_tpu.train.scored_pool import balanced_slots


def _setup(n_neg=12, n_pairs=6):
    cfg = T5Config.tiny(vocab_size=256)
    tok = HashTokenizer(vocab_size=256)
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=8, seed=0)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=4, max_d_tokens=8)
    triples = TripletStore.synthetic(corpus, n_pairs=n_pairs, n_neg=n_neg,
                                     seed=1)
    dc = DeviceCorpus.build(store, triples)
    params = init_params(jax.random.key(0), cfg)
    return cfg, tok, dc, params


def _build(cfg, tok, dc, difficulty, candidates=8, n=2, steps=8):
    # fixed-schedule controller pinned at `difficulty` so the sampling mean
    # is deterministic
    ctrl = InterpController(start=difficulty, end=difficulty, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=steps)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=n,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=n, candidates=candidates,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    return ctrl, tx, fused


def test_balanced_slots():
    s = balanced_slots(100, 10)
    assert s[0] == 0 and s[-1] == 99 and len(s) == 10
    assert (np.diff(s) > 0).all()
    np.testing.assert_array_equal(balanced_slots(8, 8), np.arange(8))
    with pytest.raises(ValueError):
        balanced_slots(8, 9)


@pytest.mark.parametrize("difficulty,expect_hard", [(0.999, True),
                                                    (0.001, False)])
def test_selection_follows_model_order(difficulty, expect_hard):
    """At difficulty ~1 the trained negatives must be (nearly) the model's
    hardest-scored candidates; at ~0 the easiest. Verified by re-scoring
    the full candidate set directly and comparing score ranks."""
    cfg, tok, dc = _setup()[:3]
    params = init_params(jax.random.key(0), cfg)
    ctrl, tx, fused = _build(cfg, tok, dc, difficulty, candidates=8, n=2)
    state = init_train_state(params, tx, ctrl.init())

    pair_idx = jnp.arange(4, dtype=jnp.int32)
    # reproduce the step's internal selection: same fold_in key
    slots = balanced_slots(int(dc.n_neg), 8)
    cand_d = np.asarray(dc.pools)[np.asarray(pair_idx)][:, slots]  # (4, 8)
    q = np.asarray(dc.query_rows)[np.asarray(pair_idx)]
    ids, mask = dc.assemble(jnp.asarray(np.repeat(q, len(slots))),
                            jnp.asarray(cand_d.reshape(-1)))
    scores = np.asarray(
        score_batch(params, cfg, ids, mask, rel_id=tok.true_id,
                    nrel_id=tok.false_id)
    ).reshape(4, len(slots))

    _, metrics = jax.jit(fused)(state, pair_idx)
    # the metric contract
    assert float(metrics["neg_scored"]) == 4 * len(slots) + 4 * 2
    assert 0.0 <= float(metrics["neg_rank_static"]) <= 1.0

    # re-derive the step's internal selection (same fold_in key) and pin the
    # step's reported model-order ranks to it — ties the wiring, not just
    # the math
    order = np.argsort(scores, axis=1)
    # binomial at mean ~1 (~0) concentrates at the last (first) positions
    from pacednegatives_tpu.ops.sampling import sample_pool_indices_batch

    key = jax.random.fold_in(state.key, state.step)
    sel = np.asarray(sample_pool_indices_batch(
        key, len(slots), jnp.full((4,), difficulty), 2
    ))
    # step metrics carry the MEAN model-order rank (train/step.py averages
    # batch["neg_rank"]) — pin it to the re-derived selection exactly
    np.testing.assert_allclose(
        float(metrics["neg_rank"]),
        float(np.mean(sel.astype(np.float32) / (len(slots) - 1))),
        rtol=1e-6,
    )
    picked_scores = np.take_along_axis(
        scores, np.take_along_axis(order, sel, axis=1), axis=1
    )
    if expect_hard:
        # every picked candidate scores in the top half of its pool
        med = np.median(scores, axis=1, keepdims=True)
        assert (picked_scores >= med).all()
    else:
        med = np.median(scores, axis=1, keepdims=True)
        assert (picked_scores <= med).all()


def test_step_trains_and_is_scannable():
    cfg, tok, dc, params = _setup()
    ctrl, tx, fused = _build(cfg, tok, dc, 0.5, candidates=6, n=2)
    state = init_train_state(params, tx, ctrl.init())
    idx = jnp.arange(8, dtype=jnp.int32).reshape(2, 4) % dc.num_pairs
    chunk = jax.jit(lambda s, i: jax.lax.scan(fused, s, i))
    new_state, m = chunk(state, idx)
    assert np.isfinite(np.asarray(m["loss"])).all()
    assert float(m["pool_score_spread"][-1]) >= 0.0
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(new_state.params))
    )
    assert moved


def test_scored_pool_dp8_matches_single_device():
    """The scored-pool step under a dp=8 GSPMD mesh is bit-identical to
    single-device (scoring pass + selection + train all partition cleanly;
    run 2026-08-18 measured diff exactly 0.0)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pacednegatives_tpu.parallel import (
        MeshConfig,
        create_mesh,
        param_shardings,
    )

    cfg, tok, dc, params = _setup(n_neg=12, n_pairs=16)
    ctrl, tx, fused = _build(cfg, tok, dc, 0.5, candidates=8, n=2)
    mesh = create_mesh(MeshConfig(data=8, model=1))
    state = init_train_state(params, tx, ctrl.init())
    sharded = state._replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    idx = jnp.arange(8, dtype=jnp.int32) % dc.num_pairs
    with mesh:
        _, m8 = jax.jit(fused)(
            sharded, jax.device_put(idx, NamedSharding(mesh, P("data")))
        )
    _, m1 = jax.jit(fused)(state, idx)
    assert float(m8["loss"]) == float(m1["loss"])
    # the rank MEAN may differ by one fp32 ulp (sharded reduction order);
    # the selection itself is identical (the loss above is bit-exact)
    assert float(m8["neg_rank"]) == pytest.approx(float(m1["neg_rank"]),
                                                  rel=1e-6)


def test_scored_pool_negative_parallel_dp_seq_mesh():
    """negative_parallel=True shards the (B*C) scoring rows and the train
    batch over ("data", "seq"): on a dp2 x seq2 x tp2 mesh the result
    matches single-device within sharded-reduction tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pacednegatives_tpu.parallel import (
        MeshConfig,
        create_mesh,
        param_shardings,
    )

    cfg, tok, dc, params = _setup(n_neg=12, n_pairs=16)
    ctrl = InterpController(start=0.5, end=0.5, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    mk = lambda npar: make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, negative_parallel=npar,
    )
    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))
    state = init_train_state(params, tx, ctrl.init())
    sharded = state._replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    idx = jnp.arange(8, dtype=jnp.int32) % dc.num_pairs
    with mesh:
        _, m_np = jax.jit(mk(True))(
            sharded,
            jax.device_put(idx, NamedSharding(mesh, P(("data", "seq")))),
        )
    _, m1 = jax.jit(mk(False))(state, idx)
    assert float(m_np["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    assert float(m_np["neg_rank"]) == pytest.approx(float(m1["neg_rank"]),
                                                    rel=1e-6)


def test_runner_scored_pool_end_to_end(tmp_path):
    """--scored_pool N through the full runner/CLI surface: trains, logs
    the neg_scored/neg_rank_static metrics, and validates bad combos."""
    from pacednegatives_tpu.train.runner import RunConfig, run

    base = dict(
        curriculum="lce", model="tiny", total_steps=8, batch_size=4, n=2,
        chunk_size=1, synthetic_pairs=16, synthetic_pool=12,
        scored_pool=6, out_dir=str(tmp_path / "run"),
    )
    summary = run(RunConfig(**base))
    assert np.isfinite(summary["final_loss"])
    rows = [
        __import__("json").loads(line)
        for line in open(tmp_path / "run" / "metrics.jsonl")
    ]
    assert any("neg_scored" in r for r in rows)
    with pytest.raises(ValueError):
        run(RunConfig(**{**base, "mining": "online"}))
    with pytest.raises(ValueError):
        run(RunConfig(**{**base, "scored_pool_dtype": "fp8"}))
    with pytest.raises(ValueError):
        run(RunConfig(**{**base, "curriculum": "interp"}))


def test_scored_pool_with_packed_assembly():
    """Scored-pool selection composes with packed=True assembly: the
    candidate scoring forward and the train step both see contiguous
    prompts (mask rows monotone nonincreasing), and the step trains."""
    cfg = T5Config.tiny(vocab_size=256)
    tok = HashTokenizer(vocab_size=256)
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=8, seed=0)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=4, max_d_tokens=8)
    triples = TripletStore.synthetic(corpus, n_pairs=6, n_neg=12, seed=1)
    dc = DeviceCorpus.build(store, triples, packed=True)
    params = init_params(jax.random.key(0), cfg)

    # the packed flag must hold for every assembly the step performs
    ids, mask = dc.assemble(jnp.arange(4), jnp.arange(4))
    m = np.asarray(mask)
    assert (np.diff(m, axis=1) <= 0).all()

    ctrl, tx, fused = _build(cfg, tok, dc, difficulty=0.5)
    state = init_train_state(params, tx, ctrl.init())
    state, metrics = jax.jit(fused)(state, jnp.arange(4) % dc.num_pairs)
    assert np.isfinite(float(metrics["loss"]))


def test_candidate_count_validation():
    cfg, tok, dc, params = _setup()
    ctrl = EtaController(eta0=1.0, meta_lr=0.01, warmup_steps=1,
                         total_steps=4)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=4,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    with pytest.raises(ValueError):
        make_scored_pool_step(dc, step, ctrl, cfg, n_neg_per_example=4,
                              candidates=2, rel_id=tok.true_id,
                              nrel_id=tok.false_id)


def test_score_chunking_matches_single_call():
    """score_chunk_rows bounds the scoring pass's activation memory (B*C
    rows in one forward OOMs a real chip at C=256) without changing the
    math: the chunked lax.map pass must reproduce the single-call step
    exactly — same selection, same loss, same metrics."""
    cfg, tok, dc, params = _setup()
    ctrl = InterpController(start=0.7, end=0.7, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    mk = lambda chunk: make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, score_chunk_rows=chunk,
    )
    pair_idx = jnp.arange(4, dtype=jnp.int32)
    state0 = init_train_state(params, tx, ctrl.init())
    s_one, m_one = jax.jit(mk(4 * 8))(state0, pair_idx)     # single call
    state0 = init_train_state(params, tx, ctrl.init())
    s_chk, m_chk = jax.jit(mk(8))(state0, pair_idx)         # 4 chunks
    np.testing.assert_allclose(float(m_one["loss"]), float(m_chk["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(m_one["pool_score_spread"]), float(m_chk["pool_score_spread"]),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(m_one["neg_rank_static"]), float(m_chk["neg_rank_static"]),
        rtol=1e-6)
    # a non-divisor chunk size rounds down to a divisor and still matches
    state0 = init_train_state(params, tx, ctrl.init())
    s_odd, m_odd = jax.jit(mk(7))(state0, pair_idx)
    np.testing.assert_allclose(float(m_one["loss"]), float(m_odd["loss"]),
                               rtol=1e-6)
    # params after the step agree (selection identical => same train batch)
    a = jax.tree_util.tree_leaves(s_one.params)
    b = jax.tree_util.tree_leaves(s_chk.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def _varlen_setup(packed=True, n_neg=12, n_pairs=6):
    """Variable-length corpus (the regime length-bucketed scoring exists
    for): doc word counts 2..15 against a 16-token budget, so true prompt
    lengths spread well below the padded max."""
    cfg = T5Config.tiny(vocab_size=256)
    tok = HashTokenizer(vocab_size=256)
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    corpus = TextCorpus(
        [f"d{i}" for i in range(64)],
        [" ".join(rng.choice(words, size=int(k)))
         for k in rng.integers(2, 16, size=64)],
        [f"q{i}" for i in range(8)],
        [" ".join(rng.choice(words, size=int(k)))
         for k in rng.integers(1, 4, size=8)],
    )
    store = TokenizedStore.build(corpus, tok, max_q_tokens=4, max_d_tokens=16)
    triples = TripletStore.synthetic(corpus, n_pairs=n_pairs, n_neg=n_neg,
                                     seed=1)
    dc = DeviceCorpus.build(store, triples, packed=packed)
    params = init_params(jax.random.key(0), cfg)
    return cfg, tok, dc, params


def test_score_buckets_match_unbucketed():
    """Length-bucketed scoring is EXACT: a masked T5 forward is padding-
    invariant, so scoring a row at the smallest bucket width covering its
    true length reproduces the full-width score — same selection, same
    loss, same trained params. (The bucket only skips pad FLOPs; the win
    is performance, pinned on hardware by the scored*_bkt_188 arms.)"""
    cfg, tok, dc, params = _varlen_setup(packed=True)
    ctrl = InterpController(start=0.7, end=0.7, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    mk = lambda **kw: make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, **kw,
    )
    pair_idx = jnp.arange(4, dtype=jnp.int32)

    state0 = init_train_state(params, tx, ctrl.init())
    s_ref, m_ref = jax.jit(mk())(state0, pair_idx)  # full width, one call

    # bucketed + chunked: 4 chunks of 8 length-sorted rows, widths chosen
    # per chunk from the bucket ladder (plus the full width, appended)
    state0 = init_train_state(params, tx, ctrl.init())
    s_bkt, m_bkt = jax.jit(mk(score_buckets=(8, 12, 16, 20),
                              score_chunk_rows=8))(state0, pair_idx)

    for k in ("loss", "pool_score_spread", "neg_rank_static"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_bkt[k]),
                                   rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_bkt.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    # single-call bucketed (chunk == rows) also matches
    state0 = init_train_state(params, tx, ctrl.init())
    s_one, m_one = jax.jit(mk(score_buckets=(8, 12, 16, 20)))(
        state0, pair_idx)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_one["loss"]),
                               rtol=1e-5)


def test_score_buckets_require_packed_corpus():
    """The segment layout interleaves pads between prompt segments, so a
    [:, :W] slice would drop real tokens — bucketed scoring must refuse it
    loudly rather than score truncated prompts."""
    cfg, tok, dc, params = _varlen_setup(packed=False)
    ctrl = InterpController(start=0.5, end=0.5, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_scored_pool_step(
        dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
        rel_id=tok.true_id, nrel_id=tok.false_id, score_buckets=(8, 12),
    )
    state = init_train_state(params, tx, ctrl.init())
    with pytest.raises(ValueError, match="packed"):
        jax.jit(fused)(state, jnp.arange(4, dtype=jnp.int32))


def test_score_buckets_validation():
    cfg, tok, dc, params = _varlen_setup(packed=True)
    ctrl = InterpController(start=0.5, end=0.5, num_steps=1)
    tx = make_optimizer(lr=1e-3, total_steps=8)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    with pytest.raises(ValueError, match="positive"):
        make_scored_pool_step(
            dc, step, ctrl, cfg, n_neg_per_example=2, candidates=8,
            rel_id=tok.true_id, nrel_id=tok.false_id, score_buckets=(0, 8),
        )
