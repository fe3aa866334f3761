"""Golden pacing test: the eta feedback loop actually traverses the pool.

This is the product's namesake dynamic (reference old/eta_bound.py:164,
lceT5.py:77-80,167): the learnable threshold eta rises as the model's losses
fall, difficulty tracks eta, and the binomial sampler therefore draws
measurably harder negatives from the pool. Round-1 artifacts had this
saturated at difficulty=1.0 from step 0 (eta0 on an unnormalized random-init
CE scale); with ce_scale normalization (curriculum/eta.py docstring) the
trajectory must now be demonstrably non-constant, and the sampled pool ranks
must track it.
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
from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.train import (
    MetricWriter,
    TrainLoop,
    init_train_state,
    make_fused_step,
    make_optimizer,
    make_train_step,
)

VOCAB = 1024
N = 4  # negatives per example
STEPS = 260


@pytest.fixture(scope="module")
def paced_history():
    corpus = TextCorpus.synthetic(num_docs=256, num_queries=32, seed=7)
    tok = HashTokenizer(vocab_size=VOCAB)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=30)
    triples = TripletStore.synthetic(corpus, n_pairs=128, n_neg=32, seed=7)
    dc = DeviceCorpus.build(store, triples)
    cfg = T5Config.tiny(vocab_size=VOCAB)
    params = init_params(jax.random.key(0), cfg)

    # LCEModel regime: eta0 = -log(1/2) * 1/2 (train/meta.py:33), sum over
    # negatives, CE normalized by its random-init plateau (1+n) * log(V)
    ctrl = EtaController(
        eta0=0.3466, meta_lr=0.03, warmup_steps=10, total_steps=STEPS,
        kind="lce", objective="weighted_ce", optimizer="adamw", clamp=False,
        ce_scale=(1 + N) * float(np.log(VOCAB)),
    )
    tx = make_optimizer(lr=2e-3, total_steps=STEPS)
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=N, use_mean=False,
        rel_id=tok.true_id, nrel_id=tok.false_id,
    )
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=N)
    state = init_train_state(params, tx, ctrl.init())
    loop = TrainLoop(
        fused_step=fused, num_pairs=128, batch_size=16, chunk_size=20,
        shuffle=True, log_mode="mean",
    )
    w = MetricWriter(None)
    loop.run(state, STEPS, w)
    return [h for h in w.history if "difficulty" in h]


def test_difficulty_traverses(paced_history):
    diff = np.array([h["difficulty"] for h in paced_history])
    # starts in the reference's eta0 regime, NOT saturated at 1.0
    assert diff[0] < 0.45, f"difficulty saturated from step 0: {diff[0]}"
    # moves a meaningful distance through (0, 1)
    assert diff.max() - diff.min() > 0.15, f"difficulty flat: {diff}"
    assert diff[-1] > diff[0] + 0.1, f"difficulty did not rise: {diff}"
    # monotone-ish: the running max is achieved late, not by a spike
    assert diff[-1] >= 0.9 * diff.max()


def test_pool_hardness_tracks_difficulty(paced_history):
    """The sampler's mean drawn pool rank must follow difficulty — the
    actual 'paced negatives' contract (binomial mean = difficulty)."""
    diff = np.array([h["difficulty"] for h in paced_history])
    rank = np.array([h["neg_rank"] for h in paced_history])
    # binomial over ranks is centered at difficulty: tight tracking
    assert np.abs(rank - diff).mean() < 0.08, (diff, rank)
    # and the negatives actually get harder over the run
    assert rank[-1] > rank[0] + 0.1
    corr = np.corrcoef(diff, rank)[0, 1]
    assert corr > 0.9, f"pool hardness decoupled from difficulty: corr={corr}"


def test_success_rate_is_threshold_semantics(paced_history):
    """success_rate = mean(ce < eta) (old/eta_bound.py:57-58): starts low
    (random-init CE above threshold), ends high (losses below eta)."""
    sr = np.array([h["success_rate"] for h in paced_history])
    assert sr[0] < 0.9
    assert sr[-1] > 0.9
    # probs = pairwise accuracy (old/eta_bound.py:51-55) also learned
    probs = np.array([h["probs"] for h in paced_history])
    assert probs[-1] > 0.9
