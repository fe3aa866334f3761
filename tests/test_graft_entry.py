"""The driver contract: entry() must be jittable, dryrun_multichip must
compile + run the full sharded training step on the virtual 8-device mesh."""

import sys

import numpy as np
import pytest

import jax


sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)  # raises on any failure


def test_collectives_helpers():
    from jax.sharding import PartitionSpec as P

    from pacednegatives_tpu.parallel import MeshConfig, create_mesh
    from pacednegatives_tpu.parallel.collectives import (
        gather_batch,
        global_mean,
        merge_topk,
    )

    mesh = create_mesh(MeshConfig(data=8, model=1))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 4)).astype(np.float32)

    def body(xs):
        g = gather_batch(xs)
        m = global_mean(jnp.mean(xs))
        return g, m

    import jax.numpy as jnp

    g, m = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P("data", None),
            out_specs=(P(), P()), check_vma=False,
        )
    )(jnp.asarray(x))
    assert g.shape == (16, 4)
    np.testing.assert_allclose(float(m), x.mean(), rtol=1e-6)

    # merge_topk == single-machine top-k over the concatenated candidates
    scores = rng.normal(size=(8, 4, 8)).astype(np.float32)  # per-chip (B=4, k=8)
    idx = rng.integers(0, 1000, size=(8, 4, 8)).astype(np.int32)

    def mbody(s, i):
        return merge_topk(s[0], i[0], 8)

    v, gi = jax.jit(
        jax.shard_map(
            mbody, mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None)),
            out_specs=(P(), P()), check_vma=False,
        )
    )(jnp.asarray(scores), jnp.asarray(idx))
    all_s = np.moveaxis(scores, 0, 1).reshape(4, 64)
    all_i = np.moveaxis(idx, 0, 1).reshape(4, 64)
    for b in range(4):
        order = np.argsort(-all_s[b])[:8]
        np.testing.assert_allclose(np.asarray(v)[b], all_s[b][order], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(gi)[b], all_i[b][order])
