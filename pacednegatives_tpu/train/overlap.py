"""Overlapped index refresh: re-encode the corpus on a dedicated encode
submesh while training keeps running on the remaining devices.

Single-device reality check (measured, ROADMAP §gaps): at 8.8M docs a full
refresh is ~990 s of device time, and although the host dispatches it
asynchronously, the next train chunk data-depends on the new embeddings, so
the DEVICE serializes train -> refresh -> train: refresh is dead time. The
reference never hits this because its pools are static BM25 files (PISA,
built once offline — mine_negatives.py, compute_all_bm25.py); the price of
*online* pools that track the current model is periodic re-encoding, and on
one chip that price is unavoidable serial time.

On a mesh it is not. Devices are split into two disjoint groups:

  train submesh  (T devices)  — runs fused train chunks, dp(+tp) as usual
  encode submesh (E devices)  — runs refresh slices, rows sharded over E

Because the groups are disjoint, their XLA programs have no device in
common and execute CONCURRENTLY — the refresh costs zero train-side device
time. The host protocol per refresh cycle:

  1. ``start(params)``  at the trigger step: transfer params to the encode
     submesh (one cross-mesh device_put, ICI) and dispatch every refresh
     slice (async — the host returns immediately).
  2. training continues on the train submesh against the OLD embeddings.
  3. ``collect(...)``   at a later chunk boundary: assemble the new index
     on the train submesh (per-slice cross-mesh transfer + donated-buffer
     insert, same no-2x-index discipline as train.online.make_refresh_fn)
     and swap it into the scan carry.

Semantics vs the serial loop: the refresh still encodes with the params of
the TRIGGER step, but the swap lands ``swap_delay`` steps later, so steps in
(trigger, trigger+delay] mine from an index that is one refresh older than
the serial loop's. That staleness is bounded and explicit (the caller picks
the delay >= the refresh's wall time / step time); pool quality degrades
smoothly with index age, while the serial alternative pays the full refresh
as dead time. Steady-state overhead: T/(T+E) throughput scaling vs ~0
refresh stall — at 8.8M docs / t5-small / 8 chips (6+2), the measured
single-chip numbers project refresh ~330 s on 2 chips vs 19,800 steps of
train progress in that window; the serial loop would stall ~124 s every
refresh_every steps (8-chip refresh) on top of full-mesh training.

Tested on the 8-device virtual CPU mesh (tests/test_overlap.py): slice
outputs bit-match the serial refresh, training runs to completion with a
refresh in flight without awaiting it, and the swap lands exactly at the
configured boundary. Exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pacednegatives_tpu.data.device_corpus import DeviceCorpus
from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.dual_encoder import encode_corpus
from pacednegatives_tpu.train.online import OnlineMiningConfig


def split_devices(devices, n_encode: int):
    """(train_devices, encode_devices) — the LAST n_encode devices encode.

    Taking a contiguous tail keeps both groups ICI-contiguous on real
    slices (jax.devices() is topology-ordered)."""
    devices = list(devices)
    if not 0 < n_encode < len(devices):
        raise ValueError(
            f"n_encode must be in (0, {len(devices)}), got {n_encode}"
        )
    return devices[:-n_encode], devices[-n_encode:]


@dataclasses.dataclass
class OverlappedRefresher:
    """Index refresh on a dedicated encode submesh (see module docstring).

    Build once per run: the doc-token slices are transferred to the encode
    submesh at construction (tokens are static — only params move per
    refresh). ``start`` dispatches; ``collect`` assembles on the target
    sharding, blocking only if the refresh is still running there and then.
    """

    corpus: DeviceCorpus
    model_cfg: t5.T5Config
    mining: OnlineMiningConfig
    encode_devices: Any  # sequence of jax devices

    def __post_init__(self):
        enc = list(self.encode_devices)
        self.enc_mesh = Mesh(
            np.asarray(enc).reshape(len(enc), 1, 1), ("data", "seq", "model")
        )
        E = len(enc)
        rows = int(self.corpus.d_tokens.shape[0])
        per = max(min(rows, self.mining.refresh_rows_per_call), 1)
        # round the slice size up to a multiple of E so every slice shards
        # evenly; the last slice is padded with pad_id rows and trimmed at
        # insert time
        per += (-per) % E
        tok_host = np.asarray(self.corpus.d_tokens)
        mask_host = (
            None if self.corpus.d_mask is None
            else np.asarray(self.corpus.d_mask)
        )
        row_sharded = NamedSharding(self.enc_mesh, P("data", None))
        self._slices = []  # (offset, true_rows, tokens_dev, mask_dev)
        for i in range(0, rows, per):
            size = min(i + per, rows) - i
            padded = size + (-size) % E
            t = tok_host[i : i + size]
            if padded != size:
                t = np.concatenate(
                    [t, np.full((padded - size, t.shape[1]),
                                self.corpus.pad_id, t.dtype)]
                )
            m = None
            if mask_host is not None:
                m = mask_host[i : i + size]
                if padded != size:
                    m = np.concatenate(
                        [m, np.zeros((padded - size, m.shape[1]), m.dtype)]
                    )
                m = jax.device_put(m, row_sharded)
            self._slices.append(
                (i, size, jax.device_put(t, row_sharded), m)
            )

        cfg, mining, pad_id = self.model_cfg, self.mining, self.corpus.pad_id

        def _local(params, tokens, mask):
            # runs per-device on the encode submesh: plain local batch scan,
            # no collectives (shard_map guarantees it)
            emb = encode_corpus(
                params, cfg, tokens, mask,
                batch_size=mining.encode_batch, pad_id=pad_id,
            )
            if mining.quantize:
                from pacednegatives_tpu.ops.mips import quantize_embeddings

                return quantize_embeddings(emb)  # per-row: exact per shard
            return (emb,)

        out_specs = (
            (P("data", None), P("data")) if mining.quantize
            else (P("data", None),)
        )
        self._refresh_slice = jax.jit(
            jax.shard_map(
                _local,
                mesh=self.enc_mesh,
                in_specs=(P(), P("data", None), P("data", None)),
                out_specs=out_specs,
            ),
            static_argnums=(),
        )
        self._pending: list | None = None

        # donated-buffer insert on the TARGET sharding (no 2x-index concat;
        # see train.online.make_refresh_fn for the single-chip analogue)
        self._insert = jax.jit(
            lambda b, v, i: jax.lax.dynamic_update_slice_in_dim(b, v, i, 0),
            donate_argnums=(0,),
        )

    @property
    def in_flight(self) -> bool:
        return self._pending is not None

    def start(self, params) -> None:
        """Transfer params to the encode submesh and dispatch every refresh
        slice. Returns immediately (async dispatch); call ``collect`` later.
        """
        if self._pending is not None:
            raise RuntimeError("refresh already in flight — collect() first")
        p_enc = jax.device_put(
            params, NamedSharding(self.enc_mesh, P())
        )
        self._pending = [
            (off, size, self._refresh_slice(p_enc, t, m))
            for off, size, t, m in self._slices
        ]

    def discard(self) -> None:
        """Drop an in-flight refresh without assembling the index.

        Releases the pending per-slice buffers; outstanding encode work on
        the device completes on its own and its results are freed. Use at
        shutdown — ``collect()`` would pay a full-size allocation plus all
        cross-mesh transfers for a result nobody reads (at the 8.8M-doc
        design point that is a ~4.5 GB assembly)."""
        self._pending = None

    def collect(self, target_sharding=None, old=None):
        """Assemble the new index. ``target_sharding`` places the result
        (e.g. the train mesh's P("data", None)); ``old`` may donate the
        previous embeddings buffer (same shape/dtype) for in-place insert.
        Blocks only on any refresh work still outstanding."""
        if self._pending is None:
            raise RuntimeError("no refresh in flight")
        pending, self._pending = self._pending, None
        rows = int(self.corpus.d_tokens.shape[0])
        quant = self.mining.quantize
        default_dev = jax.devices()[0]

        def place(x):
            if target_sharding is None:
                return jax.device_put(x, default_dev)
            # 1-D leaves (quantization scales) shard over the same leading
            # axis as the 2-D embedding rows
            spec = target_sharding.spec
            if x.ndim < len(spec):
                spec = P(*spec[: x.ndim])
            return jax.device_put(
                x, NamedSharding(target_sharding.mesh, spec)
            )

        old_leaves = (
            None if old is None else (old if isinstance(old, tuple) else (old,))
        )
        bufs = None
        for off, size, outs in pending:
            outs = tuple(o[:size] if o.shape[0] != size else o for o in outs)
            placed = tuple(place(o) for o in outs)
            if bufs is None:
                bufs = []
                for j, o in enumerate(placed):
                    shape = (rows,) + o.shape[1:]
                    if (
                        old_leaves is not None
                        and j < len(old_leaves)
                        and old_leaves[j] is not None
                        and old_leaves[j].shape == shape
                        and old_leaves[j].dtype == o.dtype
                    ):
                        bufs.append(old_leaves[j])
                    else:
                        bufs.append(place(jnp.zeros(shape, o.dtype)))
            bufs = [
                self._insert(b, o, jnp.int32(off))
                for b, o in zip(bufs, placed)
            ]
        return tuple(bufs) if quant else bufs[0]
