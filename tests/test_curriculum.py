"""Curriculum controller state-machine tests, incl. host-oracle replays of
the reference's schedule logic."""

import numpy as np

import jax
import jax.numpy as jnp

from pacednegatives_tpu.curriculum import (
    EtaController,
    InterpController,
    LevelController,
    MetaWeightTable,
    StepSignals,
)


def _signals(pce, nce, success=None):
    pce = jnp.asarray(pce, jnp.float32)
    nce = jnp.asarray(nce, jnp.float32)
    ce = (pce + nce) / 2
    if success is None:
        success = jnp.zeros_like(pce)
    return StepSignals(pce=pce, nce=nce, ce=ce, success=jnp.asarray(success, jnp.float32))


def test_interp_matches_reference_schedule():
    """old/interp.py:10-18: value = start + step*batch_size * slope, capped."""
    ctrl = InterpController(start=0.1, end=0.9, num_steps=100, batch_size=4)
    state = ctrl.init()
    vals = []
    for _ in range(50):
        vals.append(float(ctrl.difficulty(state)))
        state = ctrl.update(state, _signals([0.0], [0.0]))

    def ref(step):
        pos = step * 4
        if pos > 100:
            return 0.9
        return 0.1 + pos * (0.9 - 0.1) / 100

    want = [ref(i) for i in range(50)]
    np.testing.assert_allclose(vals, want, rtol=1e-5)


def test_level_bumps_on_success():
    ctrl = LevelController(n_neg=10, threshold=0.5, check_every=3, start=0.0)
    state = ctrl.init()
    # Success rate 1.0 -> bump by 1/10 at steps 3, 6, ...
    for i in range(1, 7):
        state = ctrl.update(state, _signals([0.0], [0.0], success=[1.0, 1.0]))
        expected = 0.1 * (i // 3)
        assert abs(float(state.difficulty) - expected) < 1e-6, (i, float(state.difficulty))


def test_level_no_bump_below_threshold_and_cap():
    ctrl = LevelController(n_neg=2, threshold=0.9, check_every=1, start=0.0)
    state = ctrl.init()
    state = ctrl.update(state, _signals([0.0], [0.0], success=[0.5]))
    assert float(state.difficulty) == 0.0
    # cap at 1.0
    ctrl2 = LevelController(n_neg=2, threshold=0.1, check_every=1, start=0.9)
    state2 = ctrl2.init()
    for _ in range(3):
        state2 = ctrl2.update(state2, _signals([0.0], [0.0], success=[1.0]))
    assert float(state2.difficulty) == 1.0


def test_eta_moves_toward_losses_and_clamps():
    """With losses below eta, d obj/d eta < 0 is not guaranteed sign-wise, but
    the -sum(v) term pushes eta UP (more examples admitted) when losses are
    small. Check direction and clamping."""
    ctrl = EtaController(eta0=0.5, meta_lr=0.05, warmup_steps=1, total_steps=100)
    state = ctrl.init()
    for _ in range(20):
        state = ctrl.update(state, _signals([0.1, 0.2], [0.1, 0.3]))
    assert float(state.eta) > 0.5  # admits more: eta grows
    assert float(state.eta) <= 1.0  # clamp (old/eta_bound passes max=1.)

    # difficulty mirrors eta
    assert abs(float(ctrl.difficulty(state)) - min(float(state.eta), 1 - 1e-10)) < 1e-8


def test_eta_update_is_jittable_and_matches_manual_grad():
    ctrl = EtaController(eta0=0.5, meta_lr=1e-3, warmup_steps=1, total_steps=10)
    state = ctrl.init()
    sig = _signals([0.4, 0.9], [0.2, 1.1])

    jit_update = jax.jit(ctrl.update)
    s1 = jit_update(state, sig)
    s2 = ctrl.update(state, sig)
    np.testing.assert_allclose(float(s1.eta), float(s2.eta), rtol=1e-6)

    # objective gradient sanity: v = 1 - ce/eta on active set; finite diff
    g = jax.grad(lambda e: ctrl._objective(e, sig))(jnp.float32(0.5))
    eps = 1e-4
    fd = (
        float(ctrl._objective(jnp.float32(0.5 + eps), sig))
        - float(ctrl._objective(jnp.float32(0.5 - eps), sig))
    ) / (2 * eps)
    assert abs(float(g) - fd) < 1e-2


def test_lce_variant_objective():
    ctrl = EtaController(
        eta0=0.3, kind="lce", objective="weighted_ce", optimizer="adamw",
        warmup_steps=1, total_steps=10,
    )
    sig = _signals([0.2, 0.5], [0.1, 0.4])
    # weighted_ce = mean(v*ce), v = ce/eta below threshold else 0
    ce = np.asarray(sig.ce)
    v = np.where(ce <= 0.3, ce / 0.3, 0.0)
    want = np.mean(v * ce)
    got = float(ctrl._objective(jnp.float32(0.3), sig))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_meta_weight_table_cheap_update_matches_reference_formula():
    table = MetaWeightTable(num_batches=4, batch_size=3)
    state = table.init()
    assert np.all(np.asarray(state.table) == 1.0)

    j = jnp.int32(2)
    v = table.lookup(state, j)
    pce = jnp.array([0.5, 1.0, 2.0])
    nce = jnp.array([0.5, 2.0, 4.0])
    lr = jnp.float32(0.1)
    raw = table.cheap_update(v, pce, nce, lr)
    # reference: v - lr * ((pce+nce)/B - 1)
    want_raw = 1.0 - 0.1 * ((np.array([1.0, 3.0, 6.0]) / 3) - 1.0)
    np.testing.assert_allclose(np.asarray(raw), want_raw, rtol=1e-6)

    state = table.store(state, j, raw)
    want = 1 / (1 + np.exp(-want_raw))
    np.testing.assert_allclose(np.asarray(table.lookup(state, j)), want, rtol=1e-6)
    # other rows untouched
    np.testing.assert_allclose(np.asarray(table.lookup(state, jnp.int32(0))), 1.0)


def test_controllers_are_scan_compatible():
    """The whole curriculum must thread through lax.scan (train loop fusion)."""
    ctrl = LevelController(n_neg=5, threshold=0.5, check_every=2)
    state = ctrl.init()

    def body(state, _):
        sig = _signals([0.1], [0.1], success=[1.0])
        state = ctrl.update(state, sig)
        return state, ctrl.difficulty(state)

    final, diffs = jax.lax.scan(body, state, jnp.arange(6))
    assert float(final.difficulty) > 0
    assert diffs.shape == (6,)
