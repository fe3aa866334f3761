"""Golden integration test: the full system LEARNS on a planted-structure
corpus (SURVEY §4c — replaces the reference's notebook-based validation).

A tiny monoT5 is trained with the LCE curriculum on the synthetic corpus
(doc d is relevant to query d % num_queries, topic words planted). After
training: (a) the train-time success rate must be high, (b) the trained
reranker must beat the untrained one by MRR on held-out first-stage runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import EtaController
from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.eval import Reranker, evaluate_run
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.train import (
    MetricWriter,
    TrainLoop,
    init_train_state,
    make_fused_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def learned():
    corpus = TextCorpus.synthetic(num_docs=64, num_queries=8, seed=3)
    tok = HashTokenizer(vocab_size=1024)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=30)
    triples = TripletStore.synthetic(corpus, n_pairs=64, n_neg=16, seed=3)
    dc = DeviceCorpus.build(store, triples)
    cfg = T5Config.tiny(vocab_size=1024)
    params0 = init_params(jax.random.key(0), cfg)

    steps = 120
    # normalized-CE paced regime (curriculum/eta.py docstring): eta starts
    # at the reference default 0.5 and the loop paces instead of saturating
    ctrl = EtaController(eta0=0.5, meta_lr=0.02, warmup_steps=5,
                         total_steps=steps,
                         ce_scale=2.0 * float(np.log(1024)))
    tx = make_optimizer(lr=3e-3, total_steps=steps)
    step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=4,
                           use_mean=True, rel_id=tok.true_id, nrel_id=tok.false_id)
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=4)
    state = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params0), tx, ctrl.init()
    )
    loop = TrainLoop(fused_step=fused, num_pairs=64, batch_size=8,
                     chunk_size=20, shuffle=True)
    w = MetricWriter(None)
    state = loop.run(state, steps, w)
    return corpus, tok, store, cfg, params0, state, w.history


def test_success_rate_and_loss_improve(learned):
    *_, history = learned
    recs = [h for h in history if "loss" in h]
    assert recs[-1]["loss"] < recs[0]["loss"] * 0.5
    assert recs[-1]["success_rate"] >= 0.75


def test_trained_reranker_beats_untrained(learned):
    corpus, tok, store, cfg, params0, state, _ = learned
    qrels = {
        f"q{q}": {f"d{d}": 1 for d in range(q, 64, 8)} for q in range(8)
    }
    # first stage: 12 candidates/query incl. at least one relevant
    rng = np.random.default_rng(0)
    first = {}
    for q in range(8):
        rel = [f"d{d}" for d in range(q, 64, 8)][:2]
        others = [f"d{d}" for d in rng.choice(64, 10, replace=False)]
        docs = list(dict.fromkeys(rel + others))
        rng.shuffle(docs)
        first[f"q{q}"] = docs

    def mrr(params):
        rr = Reranker(params, cfg, store, corpus,
                      rel_id=tok.true_id, nrel_id=tok.false_id, batch_size=32)
        run = rr.rerank(first)
        per = evaluate_run(run, qrels, ["recip_rank"])
        return float(np.mean(list(per["recip_rank"].values())))

    untrained, trained = mrr(params0), mrr(state.params)
    assert trained > untrained + 0.15, (untrained, trained)
    assert trained > 0.6, trained
