"""Unit tests for losses and paced sampling against independent oracles.

These pin the pure functions the reference got subtly wrong or inconsistent
(SURVEY.md §4a): binomial sampler normalization, difficulty->index mapping,
eta-weight branches, LCE aggregation, MarginMSE.
"""

import numpy as np
import pytest
import scipy.stats
import optax

import jax
import jax.numpy as jnp

from pacednegatives_tpu.ops import (
    binomial_log_pmf,
    difficulty_to_index,
    eta_weight,
    lce_ce,
    margin_mse,
    paced_binomial_probs,
    pairwise_ce_loss,
    sample_pool_indices,
    self_paced_objective,
    token_ce,
)
from pacednegatives_tpu.ops.sampling import sample_pool_indices_batch


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def _np_softmax_ce(logits, label):
    z = logits - logits.max()
    logp = z - np.log(np.exp(z).sum())
    return -logp[label]


def test_token_ce_matches_numpy_and_ignores_index():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 3, 7)).astype(np.float32)
    labels = np.array([[1, 2, -100], [4, -100, -100]], np.int32)
    got = np.asarray(token_ce(jnp.asarray(logits), jnp.asarray(labels)))
    want0 = np.mean([_np_softmax_ce(logits[0, 0], 1), _np_softmax_ce(logits[0, 1], 2)])
    want1 = _np_softmax_ce(logits[1, 0], 4)
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-5)


def test_lce_ce_mean_and_sum():
    pce = jnp.array([1.0, 2.0])
    nce = jnp.array([1.0, 3.0, 2.0, 4.0])  # B=2, n=2
    np.testing.assert_allclose(np.asarray(lce_ce(pce, nce, 2, True)), [3.0, 5.0])
    np.testing.assert_allclose(np.asarray(lce_ce(pce, nce, 2, False)), [5.0, 8.0])


def _reference_eta_weights(loss, eta, kind):
    """Direct port of the reference loops (weights.py:36-45, 69-78)."""
    out = np.zeros_like(loss)
    for i in range(len(loss)):
        if loss[i] > eta:
            out[i] = loss[i] * 0.0 * eta  # mask = 0
        elif kind == "eta":
            out[i] = (-loss[i] / eta) + 1
        else:
            out[i] = loss[i] / eta
    return out


@pytest.mark.parametrize("kind", ["eta", "lce"])
def test_eta_weight_matches_reference_semantics(kind):
    rng = np.random.default_rng(1)
    loss = rng.uniform(0, 2, size=32).astype(np.float32)
    for eta in [0.1, 0.5, 1.0, 1.7]:
        got = np.asarray(eta_weight(jnp.asarray(loss), eta, kind))
        want = _reference_eta_weights(loss, eta, kind)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eta_weight_grad_wrt_eta():
    """d/d_eta of the self-paced objective, vs finite differences."""
    loss_p = jnp.array([0.2, 0.8, 1.5])
    loss_n = jnp.array([0.1, 0.9, 2.0])
    ce = (loss_p + loss_n) / 2

    def obj(eta):
        v = eta_weight(ce, eta, "eta")
        return self_paced_objective(loss_p, loss_n, v)

    eta0 = 0.7
    g = float(jax.grad(obj)(eta0))
    eps = 1e-4
    fd = (float(obj(eta0 + eps)) - float(obj(eta0 - eps))) / (2 * eps)
    assert abs(g - fd) < 1e-3


def test_pairwise_ce_loss():
    assert float(pairwise_ce_loss(jnp.array([1.0, 3.0]), jnp.array([2.0, 4.0]))) == 5.0


def test_margin_mse_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=16).astype(np.float32)  # 8 pairs interleaved
    y = rng.normal(size=(16, 3)).astype(np.float32)  # 3 teachers

    # Reference formula (distill/loss.py:4-9)
    tx, ty = torch.tensor(x), torch.tensor(y)
    m = lambda t: t[::2] - t[1::2]
    want = torch.mean(
        torch.stack(
            [torch.nn.functional.mse_loss(m(tx), m(ty[:, i])) for i in range(3)]
        )
    ).item()

    got = float(margin_mse(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_binomial_log_pmf_matches_scipy():
    n = 99
    k = jnp.arange(100)
    for p in [0.01, 0.3, 0.5, 0.97]:
        got = np.asarray(binomial_log_pmf(k, n, p))
        want = scipy.stats.binom.logpmf(np.arange(100), n, p)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_paced_probs_match_reference_pipeline():
    """Reference normalization incl. the variance-rescale no-op
    (dataloader.py:139-147)."""
    n_neg = 50
    # endpoints are evaluated at the fp32-safe clamp (ops/sampling._P_EPS):
    # 1 - 1e-10 is not representable in fp32 (rounds to 1.0 -> NaN PMF), so
    # the device sampler clamps to [1e-6, 1 - 1e-6] — the documented
    # divergence from the reference's float64 host sampler
    for mean in [0.0, 1e-10, 0.2, 0.5, 0.9, 1.0 - 1e-10, 1.0]:
        p_eff = min(max(mean, 1e-6), 1.0 - 1e-6)
        idx = np.arange(n_neg)
        probs = scipy.stats.binom.pmf(idx, n_neg - 1, p_eff)
        adjusted = probs / probs.sum()
        scaling = np.sqrt(0.01 / np.var(adjusted))
        adjusted = adjusted * scaling
        adjusted = adjusted / adjusted.sum()  # no-op round trip

        got = np.asarray(paced_binomial_probs(n_neg, mean))
        assert np.isfinite(got).all(), (mean, got)
        np.testing.assert_allclose(got, adjusted, rtol=2e-3, atol=1e-6)


def test_sample_without_replacement_distinct_and_in_range():
    key = jax.random.key(0)
    for i in range(20):
        idx = np.asarray(
            sample_pool_indices(jax.random.fold_in(key, i), 100, 0.5, 8)
        )
        assert len(set(idx.tolist())) == 8
        assert idx.min() >= 0 and idx.max() < 100


def test_sample_distribution_matches_pmf():
    """Empirical marginal of 1-sample draws ~ the paced PMF (chi-square-ish)."""
    n_neg, mean, draws = 20, 0.3, 4000
    keys = jax.random.split(jax.random.key(42), draws)
    idx = np.asarray(
        jax.vmap(lambda k: sample_pool_indices(k, n_neg, mean, 1)[0])(keys)
    )
    emp = np.bincount(idx, minlength=n_neg) / draws
    want = np.asarray(paced_binomial_probs(n_neg, jnp.float32(mean)))
    assert np.abs(emp - want).max() < 0.03


def test_sample_peaked_pmf_does_not_fail():
    """Reference exit()s when the PMF is too peaked (dataloader.py:149-151);
    Gumbel top-k degrades gracefully to the n most probable indices."""
    idx = np.asarray(sample_pool_indices(jax.random.key(0), 1000, 1e-10, 8))
    assert len(set(idx.tolist())) == 8


def test_batch_sampler_shapes():
    means = jnp.array([0.1, 0.5, 0.9])
    out = sample_pool_indices_batch(jax.random.key(1), 64, means, 4)
    assert out.shape == (3, 4)


def test_difficulty_to_index_matches_reference():
    """floor(w * (len(pool)-1)) per dataloader.py:29-33 where the reference's
    n_neg is len(pool)-1."""
    from math import floor, ceil

    pool_len = 101
    for w in [0.0, 0.25, 0.5, 0.999, 1.0]:
        got = int(difficulty_to_index(w, pool_len, use_max=False))
        assert got == min(pool_len - 1, floor(w * (pool_len - 1)))
        got_max = int(difficulty_to_index(w, pool_len, use_max=True))
        assert got_max == min(pool_len - 1, ceil(w * (pool_len - 1)))


def test_factored_adam_matches_adamw_on_rank1_grads():
    """moments="factored" (scale_by_adam_factored): for rank-1 |g| the
    factored second moment is exact, so updates must match AdamW up to the
    bf16 first-moment rounding."""
    import optax

    from pacednegatives_tpu.train.state import scale_by_adam_factored

    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))}
    # rank-1 g^2: g = outer(a, b) -> g^2 = outer(a^2, b^2)
    a = rng.uniform(0.5, 1.5, size=(8, 1)).astype(np.float32)
    b = rng.uniform(0.5, 1.5, size=(1, 16)).astype(np.float32)
    g = {"w": jnp.asarray(a * b), "b": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))}

    ours = scale_by_adam_factored(eps=1e-6)
    ref = optax.scale_by_adam(eps=1e-6, eps_root=0.0)
    s1 = ours.init(p)
    s2 = ref.init(p)
    for _ in range(3):
        u1, s1 = ours.update(g, s1)
        u2, s2 = ref.update(g, s2)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(u1["b"]), np.asarray(u2["b"]),
                               rtol=2e-2)


def test_factored_adam_trains_tiny_model():
    """End-to-end: the factored optimizer reduces loss on the tiny model."""
    from pacednegatives_tpu.train import make_optimizer

    tx = make_optimizer(lr=0.05, total_steps=60, moments="factored")
    w = {"a": jnp.ones((4, 8)), "c": jnp.zeros((8,))}
    target = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)), jnp.float32)

    def loss_fn(w):
        return jnp.mean((w["a"] - target) ** 2) + jnp.mean(w["c"] ** 2)

    state = tx.init(w)
    l0 = float(loss_fn(w))
    for _ in range(40):
        loss, grads = jax.value_and_grad(loss_fn)(w)
        upd, state = tx.update(grads, state, w)
        w = optax.apply_updates(w, upd)
    assert float(loss_fn(w)) < 0.2 * l0
