"""Native stacked (L, ...) parameter layout for scan_layers (ROADMAP item 4 /
VERDICT round-1 weak 5): identical math to the per-layer block_i layout,
without restacking parameters inside the trace."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.models import T5Config, init_params
from pacednegatives_tpu.models.t5 import (
    forward_logits,
    stack_params,
    unstack_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = T5Config.tiny(vocab_size=128)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 128, size=(4, 10)).astype(np.int32))
    labels = jnp.asarray(rng.integers(2, 128, size=(4, 2)).astype(np.int32))
    return cfg, params, ids, labels


def test_round_trip(setup):
    cfg, params, *_ = setup
    back = unstack_params(stack_params(params))
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_logits_match_all_layouts(setup):
    cfg, params, ids, labels = setup
    ref = forward_logits(params, cfg, ids, labels)  # python-loop layout
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    in_trace = forward_logits(params, scan_cfg, ids, labels)  # stacks in trace
    native = forward_logits(stack_params(params), scan_cfg, ids, labels)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(in_trace), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(in_trace), np.asarray(native), rtol=1e-6, atol=1e-6
    )


def test_stacked_grads_match(setup):
    cfg, params, ids, labels = setup
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)

    def loss(p, c):
        lg = forward_logits(p, c, ids, labels)
        return jnp.mean(
            -jax.nn.log_softmax(lg)[
                jnp.arange(4)[:, None], jnp.arange(2)[None, :], labels
            ]
        )

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)
    g_native = jax.grad(lambda p: loss(p, scan_cfg))(stack_params(params))
    g_native_unstacked = unstack_params(g_native)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref),
        jax.tree_util.tree_leaves(g_native_unstacked),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_stacked_param_shardings_tile_model_axis(setup):
    cfg, params, *_ = setup
    from pacednegatives_tpu.parallel import MeshConfig, create_mesh
    from pacednegatives_tpu.parallel.mesh import param_shardings

    mesh = create_mesh(MeshConfig(data=2, model=4))
    sh = param_shardings(mesh, stack_params(params))
    # attention q in the stacked encoder: (L, d_model, inner) — inner=64
    # divides model=4, leading L dim replicated
    spec = sh["encoder"]["blocks"]["self_attn"]["q"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    # rmsnorm scales replicated
    assert sh["encoder"]["blocks"]["ln_self"]["scale"].spec == (
        jax.sharding.PartitionSpec()
    )


def test_runner_stacked_layers_end_to_end(tmp_path):
    from tests.test_cli import TINY

    from pacednegatives_tpu.train.runner import RunConfig, run

    cfg = RunConfig(
        curriculum="lce", out_dir=str(tmp_path / "run"), stacked_layers=True,
        **TINY,
    )
    summary = run(cfg)
    assert summary["steps"] == 6
    assert np.isfinite(summary["final_loss"])


def test_hf_export_handles_stacked(setup, tmp_path):
    cfg, params, ids, labels = setup
    torch = pytest.importorskip("torch")
    from pacednegatives_tpu.models.hf_export import state_dict_from_params

    sd_ref = state_dict_from_params(params, cfg)
    sd_stacked = state_dict_from_params(stack_params(params), cfg)
    assert set(sd_ref) == set(sd_stacked)
    for k in sd_ref:
        assert torch.equal(sd_ref[k], sd_stacked[k]), k
