"""Mesh/sharding-rule edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_batch,
)


def test_mesh_resolution_variants():
    assert MeshConfig(data=-1, model=2).resolve(8) == (4, 2, 1)
    assert MeshConfig(data=2, model=-1).resolve(8) == (2, 4, 1)
    assert MeshConfig(data=2, model=2, seq=2).resolve(8) == (2, 2, 2)
    with pytest.raises(ValueError, match="does not cover"):
        MeshConfig(data=3, model=2).resolve(8)
    with pytest.raises(ValueError, match="at most one"):
        MeshConfig(data=-1, model=-1).resolve(8)


def test_param_shardings_divisibility_fallback():
    """Dims not divisible by the mesh axis must fall back to replication."""
    mesh = create_mesh(MeshConfig(data=2, model=4))
    params = {
        "mlp": {"wi": jnp.zeros((16, 8)), "wo": jnp.zeros((8, 16))},  # 8 % 4 == 0
        "odd": {"wi": jnp.zeros((16, 6))},  # 6 % 4 != 0 -> replicated
    }
    sh = param_shardings(mesh, params)
    assert "model" in str(sh["mlp"]["wi"].spec)
    assert str(sh["odd"]["wi"].spec) == "PartitionSpec()"


def test_shard_batch_and_replicated():
    mesh = create_mesh(MeshConfig(data=8, model=1))
    batch = {"x": np.arange(16).reshape(16, 1), "y": np.arange(16)}
    dev = shard_batch(mesh, batch)
    assert "data" in str(dev["x"].sharding.spec)
    np.testing.assert_array_equal(np.asarray(dev["y"]), batch["y"])
    r = replicated(mesh)
    assert str(r.spec) == "PartitionSpec()"
    bs = batch_sharding(mesh, ndim=3)
    assert str(bs.spec).startswith("PartitionSpec('data'")
