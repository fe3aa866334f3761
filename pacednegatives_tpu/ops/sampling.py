"""Paced negative sampling — on-device, reproducible, jittable.

The reference samples pool indices on the host with numpy/scipy inside
DataLoader workers (reference dataloader.py:134-151): a binomial PMF over
pool positions centered at the current difficulty, sampled without
replacement via ``np.random.choice``. Here the sampler is a pure function of
(PRNG key, difficulty) running on the VPU, so the curriculum feedback loop
never leaves the device (SURVEY.md §7 hard-part 3).

Pool-order convention (canonical, fixing the reference's inconsistency
between compute_all_bm25.py:44 and pisa_build_dataset.py:42): index 0 is the
EASIEST negative (lowest retrieval rank), index n_neg-1 the HARDEST
(retrieval rank 1). Difficulty w in [0, 1] maps low->easy, high->hard.

Sampling without replacement uses the Gumbel-top-k trick: adding iid
Gumbel(0,1) noise to log-probabilities and taking the top-k indices draws a
k-sized sample without replacement from the softmax distribution — exactly
the Plackett-Luce sampling scheme ``np.random.choice(replace=False, p=...)``
implements sequentially.

Note on the reference's ``var`` parameter: dataloader.py:139-147 rescales
the normalized PMF by ``sqrt(var/Var(pmf))`` and then re-normalizes — a
mathematical no-op (uniform scaling followed by normalization returns the
original distribution). We accept and ignore ``var`` for parity, and we
never hit the reference's failure mode (it ``exit()``s when the PMF is too
peaked for n distinct samples; Gumbel-top-k always returns distinct indices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, xlog1py, xlogy

# fp32-safe probability clamp. The reference caps difficulty at 1 - 1e-10 in
# float64 on the host (lceT5.py:79); 1 - 1e-10 is NOT representable in fp32
# (it rounds to exactly 1.0, making log1p(-p) = -inf and the k=n term
# 0 * -inf = NaN, which silently collapsed the PMF to "pick the easiest
# slots"). 1e-6 is comfortably inside fp32 resolution near 1 (spacing 6e-8)
# and distributionally indistinguishable from 1e-10 at pool sizes <= 1000.
_P_EPS = 1e-6


def binomial_log_pmf(k: jax.Array, n: int | jax.Array, p: jax.Array) -> jax.Array:
    """log Binomial(k; n, p), stable for p in [0, 1] under fp32.

    xlogy/xlog1py make the degenerate endpoints exact (0*log 0 = 0) even if a
    caller bypasses the clamp."""
    k = k.astype(jnp.float32)
    n = jnp.asarray(n, jnp.float32)
    p = jnp.clip(jnp.asarray(p, jnp.float32), _P_EPS, 1.0 - _P_EPS)
    return (
        gammaln(n + 1.0)
        - gammaln(k + 1.0)
        - gammaln(n - k + 1.0)
        + xlogy(k, p)
        + xlog1py(n - k, -p)
    )


def paced_binomial_log_probs(
    n_neg: int,
    mean: jax.Array,
    min_mean: float = _P_EPS,
    max_mean: float = 1.0 - _P_EPS,
) -> jax.Array:
    """(n_neg,) log-probabilities over pool indices for difficulty ``mean``.

    Matches LCEDataset.sample (reference dataloader.py:134-147): PMF of
    Binomial(n_neg-1, mean) evaluated at 0..n_neg-1, normalized. The
    variance-rescaling step is a no-op (see module docstring).
    """
    mean = jnp.clip(mean, min_mean, max_mean)
    idx = jnp.arange(n_neg, dtype=jnp.float32)
    logp = binomial_log_pmf(idx, n_neg - 1, mean)
    return jax.nn.log_softmax(logp)


def paced_binomial_probs(n_neg: int, mean: jax.Array, **kw) -> jax.Array:
    return jnp.exp(paced_binomial_log_probs(n_neg, mean, **kw))


def sample_pool_indices(
    key: jax.Array,
    n_neg: int,
    mean: jax.Array,
    n: int,
) -> jax.Array:
    """Draw ``n`` distinct pool indices ~ paced binomial PMF (Gumbel top-k)."""
    logp = paced_binomial_log_probs(n_neg, mean)
    gumbel = jax.random.gumbel(key, (n_neg,))
    _, idx = jax.lax.top_k(logp + gumbel, n)
    return idx


def sample_pool_indices_batch(
    key: jax.Array,
    n_neg: int,
    means: jax.Array,
    n: int,
) -> jax.Array:
    """(B,) difficulties -> (B, n) distinct pool indices, vmapped."""
    keys = jax.random.split(key, means.shape[0])
    return jax.vmap(lambda k, m: sample_pool_indices(k, n_neg, m, n))(keys, means)


def difficulty_to_index(
    weight: jax.Array, n_neg: int, use_max: bool = False
) -> jax.Array:
    """Scalar difficulty -> single pool index.

    Parity with TripletDataset.get_items (reference dataloader.py:29-33):
    ``round(weight * n_neg)`` where ``n_neg = len(pool) - 1`` and round is
    floor (or ceil when use_max). Here ``n_neg`` is the full pool length, so
    the multiplier is ``n_neg - 1``; result clamped to valid range.
    """
    scaled = jnp.asarray(weight, jnp.float32) * (n_neg - 1)
    idx = jnp.ceil(scaled) if use_max else jnp.floor(scaled)
    return jnp.clip(idx.astype(jnp.int32), 0, n_neg - 1)
