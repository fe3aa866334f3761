"""Multi-chunk sharded training runs on the virtual 8-device mesh — the
full production multi-chip path (loops, not just single steps): static-pool
TrainLoop and the online-mining loop with a data-sharded index."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pacednegatives_tpu.curriculum import EtaController, InterpController
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.parallel import MeshConfig, create_mesh, param_shardings
from pacednegatives_tpu.train import (
    MetricWriter,
    TrainLoop,
    init_train_state,
    make_fused_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def pieces():
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=8, seed=0)
    tok = HashTokenizer(vocab_size=512)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    triples = TripletStore.synthetic(corpus, n_pairs=64, n_neg=8, seed=1)
    dc = DeviceCorpus.build(store, triples)
    cfg = T5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=256, num_heads=4,
        num_layers=2, num_decoder_layers=2,
    )
    params = init_params(jax.random.key(0), cfg)
    return tok, dc, cfg, params


def test_sharded_trainloop_multi_chunk(pieces):
    """Several scan chunks through TrainLoop with dp=4 x tp=2 sharded state;
    shardings must survive the donated chunk calls."""
    tok, dc, cfg, params = pieces
    mesh = create_mesh(MeshConfig(data=4, model=2))
    ctrl = EtaController(eta0=8.0, meta_lr=0.01, warmup_steps=1, total_steps=12,
                         eta_max=10.0)
    tx = make_optimizer(lr=1e-3, total_steps=12)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=2)
    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tx, ctrl.init()
    )
    state = state._replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    loop = TrainLoop(fused_step=fused, num_pairs=64, batch_size=8, chunk_size=3)
    w = MetricWriter(None)
    with mesh:
        state = loop.run(state, 12, w)
    assert int(state.step) == 12
    losses = [h["loss"] for h in w.history if "loss" in h]
    assert all(np.isfinite(l) for l in losses)
    # tensor sharding survived the loop
    wi_shard = state.params["encoder"]["block_0"]["mlp"]["wi"].sharding
    assert "model" in str(getattr(wi_shard, "spec", ""))


def test_sharded_online_loop_multi_chunk(pieces):
    """Online mining loop with the index sharded over data, several chunks
    and an index refresh in the middle."""
    from pacednegatives_tpu.train.online import (
        OnlineMiningConfig,
        OnlineMiningLoop,
        make_online_fused_step,
        make_refresh_fn,
    )

    tok, dc, cfg, params = pieces
    mesh = create_mesh(MeshConfig(data=8, model=1))
    ctrl = InterpController(start=0.2, end=0.8, num_steps=24, batch_size=8)
    tx = make_optimizer(lr=1e-3, total_steps=12)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=2,
                           rel_id=tok.true_id, nrel_id=tok.false_id)
    mining = OnlineMiningConfig(pool_size=8, encode_batch=16)
    fused = make_online_fused_step(dc, step, ctrl, cfg, mining, 2)

    base_refresh = make_refresh_fn(dc, cfg, mining)
    sharding = NamedSharding(mesh, P("data", None))

    def refresh(params):
        return jax.device_put(base_refresh(params), sharding)

    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tx, ctrl.init()
    )
    state = state._replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    loop = OnlineMiningLoop(
        fused_step=fused, refresh_fn=refresh, num_pairs=dc.num_pairs,
        batch_size=8, chunk_size=3, refresh_every=6,
    )
    w = MetricWriter(None)
    with mesh:
        state = loop.run(state, 12, w)
    assert int(state.step) == 12
    assert all(np.isfinite(h["loss"]) for h in w.history if "loss" in h)
