"""Device mesh + sharding layer.

Replaces the reference's DDP/NCCL/accelerate stack (train/train_lce.py:89-91,
old/lce_wrapper.py:15,117, utilities/trainer.py:604-606 in the reference repo)
with a single JAX mesh. Axes:

- ``data``  — batch (data-parallel); gradients are psum'd by pjit automatically.
- ``model`` — tensor parallelism for the T5 weights (heads / d_ff / vocab).

The reference has no tensor/sequence parallelism at all (SURVEY.md §2.6); we
expose a ``model`` axis anyway so t5-sized rerankers and the sharded dense
index scale past one chip. Negative-pool gathers ride the ``data`` axis
(all_gather of per-chip in-batch negatives), so no separate ``neg`` axis is
needed: negatives are packed into the batch dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Negative-parallel axis: make_fused_step(negative_parallel=True) constrains
# assembled LCE batch rows over ("data", "seq"), splitting the n-negatives
# rows dp*seq ways while params shard only over "model"
# (tests/test_sharding_equivalence.py pins dp2 x seq2 x tp2 == single device).
SEQ_AXIS = "seq"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``-1`` means "all remaining devices".

    ``seq`` is the negative-parallel axis: LCE batch rows (B positives +
    B*n negatives) shard over the combined (data, seq) axes when
    make_fused_step(negative_parallel=True) — see SEQ_AXIS note above.
    Default 1 (the reference caps n at 7, where plain dp suffices).
    """

    data: int = -1
    model: int = 1
    seq: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        data, model, seq = self.data, self.model, self.seq
        if sum(x == -1 for x in (data, model, seq)) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if model == -1:
            model = n_devices // (max(data, 1) * max(seq, 1))
        if seq == -1:
            seq = n_devices // (max(data, 1) * max(model, 1))
        if data == -1:
            data = n_devices // (max(model, 1) * max(seq, 1))
        if data * model * seq != n_devices:
            raise ValueError(
                f"mesh {data}x{seq}x{model} does not cover {n_devices} devices"
            )
        return data, model, seq


def create_mesh(
    config: MeshConfig | None = None, devices: Sequence[Any] | None = None
) -> Mesh:
    """Build a (data, seq, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    data, model, seq = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, seq, model)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def current_mesh() -> Mesh | None:
    """The ambient mesh from a ``with mesh:`` context, or None outside one.

    The repo convention is the legacy context-manager mesh (every entry
    point and __graft_entry__ use ``with mesh:``), whose trace-time
    accessor still lives in pxla.thread_resources; kept behind this single
    helper so call sites (e.g. models/t5.py's flash_v3 shard_map wrapper)
    survive the accessor moving again."""
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            m = pxla.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def constrain_rows(v: jax.Array) -> jax.Array:
    """In-jit sharding constraint: leading (row) axis over the combined
    ``("data", "seq")`` mesh axes, trailing axes replicated. No-op outside
    a mesh with those axes. The SINGLE definition of the negative-parallel
    row layout — train/step.py and train/scored_pool.py both use it, so the
    fused and scored-pool paths cannot drift apart."""
    return jax.lax.with_sharding_constraint(
        v, P((DATA_AXIS, SEQ_AXIS), *([None] * (v.ndim - 1)))
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over data."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(_put, batch)


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

# Rules map (path-suffix predicates) -> PartitionSpec. T5 params are 2-D
# matrices; we shard the "wide" dimension over `model`:
#   attention q/k/v:  (d_model, n_heads*d_kv)  -> shard dim 1
#   attention o:      (n_heads*d_kv, d_model)  -> shard dim 0
#   mlp wi:           (d_model, d_ff)          -> shard dim 1
#   mlp wo:           (d_ff, d_model)          -> shard dim 0
#   embedding:        (vocab, d_model)         -> shard dim 0 (vocab)
#   rel-pos bias:     (buckets, n_heads)       -> shard dim 1 (heads)
#   rmsnorm scale:    (d_model,)               -> replicated
_RULES: tuple[tuple[str, P], ...] = (
    ("embedding", P(MODEL_AXIS, None)),
    ("rel_bias", P(None, MODEL_AXIS)),
    ("wi_0", P(None, MODEL_AXIS)),
    ("wi_1", P(None, MODEL_AXIS)),
    ("wi", P(None, MODEL_AXIS)),
    ("wo", P(MODEL_AXIS, None)),
    ("q", P(None, MODEL_AXIS)),
    ("k", P(None, MODEL_AXIS)),
    ("v", P(None, MODEL_AXIS)),
    ("o", P(MODEL_AXIS, None)),
    ("scale", P()),
)


def _spec_for(path: tuple[str, ...]) -> P:
    leaf = path[-1]
    for suffix, spec in _RULES:
        if leaf == suffix:
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """PartitionSpec pytree for a T5 params pytree (see models/t5.py layout).

    Specs whose sharded dim is not divisible by the mesh axis fall back to
    replication, so tiny test models work on any mesh.
    """

    def _shard(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = _spec_for(keys)
        # Native stacked scan layout (models/t5.stack_params): same leaf
        # names with a leading (num_layers,) dim — replicate that dim and
        # shift the rule right by one.
        if len(spec) and leaf.ndim == len(spec) + 1 and "blocks" in keys:
            spec = P(None, *spec)
        # Divisibility check: fall back to replicated if it doesn't tile.
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= leaf.ndim or leaf.shape[dim] % axis_sizes[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(_shard, params)
