"""Parallelism correctness: the SAME global batch must produce the same loss
and parameter update under dp=8, dp=4 x tp=2, and single-device execution.

This is the test DDP/NCCL setups usually lack: GSPMD partitioning must be a
pure performance transform, not a semantic one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pacednegatives_tpu.curriculum import EtaController
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.parallel import (
    MeshConfig,
    create_mesh,
    param_shardings,
)
from pacednegatives_tpu.train import (
    init_train_state,
    make_fused_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def pieces():
    corpus = TextCorpus.synthetic(num_docs=48, num_queries=8, seed=0)
    tok = HashTokenizer(vocab_size=512)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    triples = TripletStore.synthetic(corpus, n_pairs=32, n_neg=8, seed=1)
    dc = DeviceCorpus.build(store, triples)
    # dims divisible by tp=2 so tensor sharding engages
    cfg = T5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=256, num_heads=4,
        num_layers=2, num_decoder_layers=2,
    )
    params = init_params(jax.random.key(0), cfg)

    ctrl = EtaController(eta0=8.0, meta_lr=0.01, warmup_steps=1, total_steps=4, eta_max=10.0)
    tx = make_optimizer(lr=1e-3, total_steps=4)
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=2)
    return dc, cfg, params, ctrl, tx, fused


def _run(pieces, mesh_cfg):
    dc, cfg, params, ctrl, tx, fused = pieces
    params = jax.tree_util.tree_map(jnp.copy, params)
    state = init_train_state(params, tx, ctrl.init())
    pair_idx = jnp.arange(16, dtype=jnp.int32)
    if mesh_cfg is not None:
        mesh = create_mesh(mesh_cfg)
        state = state._replace(
            params=jax.device_put(state.params, param_shardings(mesh, state.params))
        )
        pair_idx = jax.device_put(pair_idx, NamedSharding(mesh, P("data")))
        with mesh:
            state2, metrics = jax.jit(fused)(state, pair_idx)
    else:
        state2, metrics = jax.jit(fused)(state, pair_idx)
    emb = np.asarray(jax.device_get(state2.params["shared"]["embedding"]))
    return float(metrics["loss"]), emb


def test_dp8_matches_single_device(pieces):
    loss_1, emb_1 = _run(pieces, None)
    loss_8, emb_8 = _run(pieces, MeshConfig(data=8, model=1))
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5)
    np.testing.assert_allclose(emb_8, emb_1, rtol=1e-4, atol=1e-6)


def test_dp2_seq2_tp2_negative_parallel_matches_single_device(pieces):
    """The reserved ``seq`` mesh axis wired to LCE negative parallelism
    (VERDICT r2 item 10): assembled batch rows constrained over
    ("data","seq") must be a pure performance transform."""
    dc, cfg, params, ctrl, tx, _ = pieces
    # Same step as pieces (rel/nrel ids from the tokenizer), new fused
    # wrapper with the negative-parallel row constraint.
    tok = HashTokenizer(vocab_size=512)
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    fused_np = make_fused_step(dc, step, ctrl, loss="lce",
                               n_neg_per_example=2, negative_parallel=True)
    np_pieces = (dc, cfg, params, ctrl, tx, fused_np)

    loss_1, emb_1 = _run(pieces, None)
    loss_np, emb_np = _run(np_pieces, MeshConfig(data=2, seq=2, model=2))
    np.testing.assert_allclose(loss_np, loss_1, rtol=1e-5)
    np.testing.assert_allclose(emb_np, emb_1, rtol=1e-4, atol=1e-6)


def test_dp4_tp2_matches_single_device(pieces):
    dc, cfg, params, *_ = pieces
    # confirm tensor sharding actually engages on at least one matrix
    mesh = create_mesh(MeshConfig(data=4, model=2))
    sh = param_shardings(mesh, params)
    wi_spec = sh["encoder"]["block_0"]["mlp"]["wi"].spec
    assert "model" in str(wi_spec)

    loss_1, emb_1 = _run(pieces, None)
    loss_tp, emb_tp = _run(pieces, MeshConfig(data=4, model=2))
    np.testing.assert_allclose(loss_tp, loss_1, rtol=1e-5)
    np.testing.assert_allclose(emb_tp, emb_1, rtol=1e-4, atol=1e-6)
