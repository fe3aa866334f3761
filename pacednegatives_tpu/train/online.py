"""Online negative mining: the dense index feeds the paced sampler at train
time.

This is the BASELINE.json north star — the inversion of the reference's
offline pipeline. The reference builds static BM25 pools once (PISA, CPU)
and only *selects* from them during training; here each step:

  1. embeds the batch queries with the CURRENT model (dual_encoder over the
     shared encoder stack),
  2. mines a fresh difficulty-ordered pool per query from the HBM dense
     index (MIPS top-k, reversed to easiest-first),
  3. samples n negatives from the paced binomial over pool ranks (exactly
     the static-pool sampler semantics — the difficulty axis is preserved),
  4. assembles prompts from the device-resident token matrices and runs the
     fused train step,

all inside one jitted program — mining never stalls the MXU on host I/O.

The index refreshes every ``refresh_every`` steps by re-encoding the corpus
with the current parameters. On a single device the refresh is asynchronous
only at the DISPATCH level: the host never blocks, but the next chunk
data-depends on the new embeddings, so the device itself serializes
train -> refresh -> train and the refresh is dead device time (measured
~990 s at 8.8M docs). True overlap needs disjoint devices — see
train/overlap.py (OverlappedRefresher), which runs the refresh on a
dedicated encode submesh while training continues on the rest
(SURVEY.md §7 hard-part 5); OnlineMiningLoop accepts one via ``overlap``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pacednegatives_tpu.data.device_corpus import DeviceCorpus
from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.dual_encoder import embed, encode_corpus
from pacednegatives_tpu.ops.mips import (
    mips_topk_approx,
    mips_topk_exact,
    mips_topk_pallas_quantized,
    mips_topk_quantized_streaming,
)
from pacednegatives_tpu.ops.sampling import sample_pool_indices_batch
from pacednegatives_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class OnlineMiningConfig:
    pool_size: int = 64  # mined pool per query (reference pools are 1000)
    encode_batch: int = 128
    method: str = "exact"  # "exact" | "approx"
    exclude_positive: bool = True
    quantize: bool = False  # int8 index in the scan carry (4x less HBM)
    # Refresh processes at most this many docs per device execution. One
    # monolithic program at 1M docs means ~85s of uninterrupted device time
    # in a single execution (runtime-watchdog territory) and a full-corpus
    # fp32 embedding transient; slicing bounds both while every slice still
    # dispatches asynchronously (no host sync between slices).
    refresh_rows_per_call: int = 262144
    # Pallas MIPS kernel tiling (measured at 8.8M docs x 512, v5e):
    # defaults block_n=4096 / k_per_block=32 take one mining call from
    # 322 ms (1024 / k'=pool+1) to 58 ms — per-block top-k' is k' VPU
    # rounds per block, and per-grid-iteration overhead dominates small
    # blocks. Larger blocks exceed the scoped-VMEM budget (int8 block +
    # bf16 dequant). Near-exact: the global top-k is only wrong if > k'
    # of the true top-k fall in ONE block, vanishingly unlikely; the
    # consumer is a difficulty-percentile sampler anyway. block_n falls
    # back to the largest power-of-two divisor of the corpus size.
    k_per_block: int = 32
    mips_block_n: int = 4096


def make_online_fused_step(
    corpus: DeviceCorpus,
    step_fn: Callable,
    controller,
    model_cfg: t5.T5Config,
    mining: OnlineMiningConfig,
    n_neg_per_example: int = 1,
):
    """fused((state, embeddings), pair_idx) -> ((state', embeddings), metrics).

    ``embeddings`` (num_docs, D) ride the scan carry so the whole loop stays
    on device; refresh swaps them between chunks.
    """
    topk = mips_topk_exact if mining.method == "exact" else mips_topk_approx
    n = n_neg_per_example
    default_corpus = corpus

    def fused(carry, pair_idx, corpus=None):
        # corpus may be threaded in as a jit ARGUMENT by the caller (see
        # DeviceCorpus pytree note) — falling back to the factory capture
        # keeps small-corpus call sites unchanged.
        corpus = default_corpus if corpus is None else corpus
        state, embeddings = carry
        difficulty = controller.difficulty(state.curriculum)
        B = pair_idx.shape[0]

        q_rows = corpus.query_rows[pair_idx]
        pos_rows = corpus.pos_rows[pair_idx]

        # 1. query embeddings under the CURRENT params (no grad into mining)
        params = jax.lax.stop_gradient(state.params)
        q_tok = corpus.q_tokens[q_rows].astype(jnp.int32)
        q_emb = embed(
            params, model_cfg, q_tok,
            corpus.q_mask[q_rows] if corpus.q_mask is not None
            else (q_tok != corpus.pad_id).astype(jnp.int32),
        )

        # 2. mine pools: top-k hardest, reversed to easiest-first
        k = mining.pool_size + (1 if mining.exclude_positive else 0)
        if mining.quantize:
            vals, scales = embeddings
            bn = mining.mips_block_n
            while bn > 1024 and vals.shape[0] % bn:
                bn //= 2
            if vals.shape[0] % bn == 0 and jax.default_backend() == "tpu":
                # int8 stays in HBM; dequantization fuses into the score
                # matmul in VMEM (never materializes the fp32 index — at
                # 1M docs x 512 that transient alone would be 2 GB/step)
                _, idx = mips_topk_pallas_quantized(
                    q_emb.astype(jnp.float32), vals, scales, k,
                    block_n=bn,
                    k_per_block=min(mining.k_per_block, k),
                )
            else:
                # Non-block-aligned row count (or non-TPU backend): the
                # STREAMING fallback — exact top-k, O(block_rows) fp32
                # transient, safe at any corpus size. (Its predecessor
                # dequantized the full index per step: a ~18 GB HBM
                # transient at 8.8M docs — a guaranteed OOM behind a
                # UserWarning. tests/test_online.py pins that no full-size
                # fp32 index appears in the lowered program.)
                _, idx = mips_topk_quantized_streaming(
                    q_emb.astype(jnp.float32), vals, scales, k
                )
        else:
            _, idx = topk(q_emb.astype(jnp.float32), embeddings, k)
        if mining.exclude_positive:
            # drop the positive if retrieved; else drop the extra last slot
            is_pos = idx == pos_rows[:, None]
            # stable compaction: give positives the worst sort key
            rank = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
            sort_key = jnp.where(is_pos, k + 1, rank)
            order = jnp.argsort(sort_key, axis=1)
            idx = jnp.take_along_axis(idx, order, axis=1)[:, : mining.pool_size]
        pools = idx[:, ::-1]  # easiest first (compute_all_bm25.py:44 parity)

        # 3. paced binomial sampling over pool ranks
        key = jax.random.fold_in(state.key, state.step)
        slots = sample_pool_indices_batch(
            key, mining.pool_size, jnp.broadcast_to(difficulty, (B,)), n
        )
        neg_rows = jnp.take_along_axis(pools, slots, axis=1)  # (B, n)

        # 4. assemble + step
        pos_ids, pos_mask = corpus.assemble(q_rows, pos_rows)
        neg_ids, neg_mask = corpus.assemble(
            jnp.repeat(q_rows, n), neg_rows.reshape(-1)
        )
        batch = {
            "pos_ids": pos_ids,
            "pos_mask": pos_mask,
            "pos_labels": corpus.labels(B, True),
            "neg_ids": neg_ids,
            "neg_mask": neg_mask,
            "neg_labels": corpus.labels(B * n, False),
            "neg_rank": (
                slots.astype(jnp.float32) / max(mining.pool_size - 1, 1)
            ).reshape(-1),
        }
        state, metrics = step_fn(state, batch)
        return (state, embeddings), metrics

    return fused


def make_refresh_fn(
    corpus: DeviceCorpus, model_cfg: t5.T5Config, mining: OnlineMiningConfig
):
    """params -> fresh (num_docs, D) corpus embeddings.

    The doc-token matrices enter the jitted program as arguments, not
    closure constants, so the compiled proto stays small at any corpus
    scale (see DeviceCorpus pytree note). Large corpora are processed in
    ``refresh_rows_per_call`` slices — separate asynchronously-dispatched
    device executions (quantization is per-row, so per-slice quantize is
    exact), bounding single-execution runtime and the fp32 transient."""

    @jax.jit
    def refresh_slice(params, d_tokens, d_mask):
        # d_mask None -> derived per encode batch inside encode_corpus
        emb = encode_corpus(
            params, model_cfg, d_tokens, d_mask,
            batch_size=mining.encode_batch,
            pad_id=corpus.pad_id,
        )
        if mining.quantize:
            from pacednegatives_tpu.ops.mips import quantize_embeddings

            return quantize_embeddings(emb)
        return emb

    rows = corpus.d_tokens.shape[0]
    per = max(min(rows, mining.refresh_rows_per_call), 1)

    # Slices insert into a preallocated DONATED buffer rather than a final
    # jnp.concatenate: the concat would materialize a second full index
    # while every slice is still alive (2x 4.5 GB at 8.8M docs — an OOM on
    # one chip). With donation the buffer updates in place and peak extra
    # memory is one slice. Slice/insert offsets are TRACED so the whole
    # sweep compiles at most twice (full slices + remainder), not per i.
    @functools.partial(jax.jit, static_argnums=(2,))
    def _slice(arr, i, size):
        return jax.lax.dynamic_slice_in_dim(arr, i, size, 0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _insert(buf, vals, i):
        return jax.lax.dynamic_update_slice_in_dim(buf, vals, i, 0)

    def refresh(params):
        if rows <= per:
            return refresh_slice(params, corpus.d_tokens, corpus.d_mask)
        bufs = None
        for i in range(0, rows, per):
            size = min(i + per, rows) - i
            ii = jnp.int32(i)
            out = refresh_slice(
                params,
                _slice(corpus.d_tokens, ii, size),
                None if corpus.d_mask is None
                else _slice(corpus.d_mask, ii, size),
            )
            leaves = out if isinstance(out, tuple) else (out,)
            if bufs is None:
                bufs = tuple(
                    jnp.zeros((rows,) + x.shape[1:], x.dtype) for x in leaves
                )
            bufs = tuple(
                _insert(b, x, ii) for b, x in zip(bufs, leaves)
            )
        return bufs if mining.quantize else bufs[0]

    return refresh


@dataclasses.dataclass
class OnlineMiningLoop:
    """Scan-chunked training with periodic index refresh."""

    fused_step: Callable  # from make_online_fused_step
    refresh_fn: Callable  # from make_refresh_fn
    num_pairs: int
    batch_size: int
    chunk_size: int = 16
    refresh_every: int = 200  # the single source of truth for refresh cadence
    seed: int = 0
    eval_fn: Callable | None = None  # state -> {metric: float}
    eval_every_steps: int = 0
    checkpoint_dir: str | None = None
    checkpoint_every_steps: int = 0
    # Checkpoint the mined-index embeddings next to each model checkpoint
    # (step_N/index.npz) and reload them on resume, making a resumed run
    # BIT-EXACT with an uninterrupted one (otherwise the index is
    # re-encoded with the restored params, and mined pools can differ
    # until the next scheduled refresh). Off by default: the snapshot
    # costs index-size disk per checkpoint (~4.5 GB int8 at 8.8M docs).
    checkpoint_index: bool = False
    exclude_pairs: tuple = ()  # held-out rows never fed to training
    log_mode: str = "last"  # "last" | "mean" | "all" (see TrainLoop)
    # When set, the corpus is threaded through the jit boundary as an
    # argument each chunk (large-corpus hygiene; fused_step must accept the
    # third ``corpus`` parameter). None keeps legacy closure capture.
    corpus: "DeviceCorpus | None" = None
    # Overlapped refresh (train/overlap.py): refresh runs on a dedicated
    # encode submesh while training continues on the train submesh. The
    # refresh still encodes with the trigger step's params, but the swap
    # lands ``overlap_delay_chunks`` chunk boundaries later (bounded,
    # explicit index staleness instead of serial refresh dead time).
    overlap: "object | None" = None  # OverlappedRefresher
    overlap_delay_chunks: int = 1
    # sharding for the assembled index on the train mesh (collect target);
    # None keeps the default single-device placement
    embedding_sharding: "object | None" = None

    def __post_init__(self):
        if self.checkpoint_index and self.overlap is not None:
            # The bit-exact resume contract cannot hold with a refresh in
            # flight: the snapshot cannot capture in-flight encode work, so
            # a restart would lose it and mine from a different index than
            # the uninterrupted run. Reject loudly instead of silently
            # weakening a documented guarantee.
            raise ValueError(
                "checkpoint_index=True is a single-mesh guarantee and is "
                "not supported together with an overlapped refresh "
                "(overlap=...); checkpoint at refresh-quiescent boundaries "
                "or disable one of the two"
            )
        if self.corpus is not None:
            def chunk_fn(carry, idx_chunk, corpus):
                body = lambda c, i: self.fused_step(c, i, corpus)
                return jax.lax.scan(body, carry, idx_chunk)
        else:
            def chunk_fn(carry, idx_chunk, corpus):
                return jax.lax.scan(self.fused_step, carry, idx_chunk)

        self._jit_chunk = jax.jit(chunk_fn, donate_argnums=0)
        self._chunk_fn = lambda carry, idx: self._jit_chunk(
            carry, idx, self.corpus
        )

    def _index_snapshot_path(self, step: int) -> str:
        import os

        return os.path.join(self.checkpoint_dir, f"step_{step}", "index.npz")

    def _save_index(self, embeddings, step: int) -> None:
        leaves = jax.tree_util.tree_leaves(embeddings)
        np.savez(
            self._index_snapshot_path(step),
            *[np.asarray(jax.device_get(l)) for l in leaves],
        )

    def _load_index(self, step: int):
        """None if no snapshot. Leaf count encodes the structure: one array
        is a plain fp32 index, two are the (int8 values, scales) pair from
        quantize_embeddings — the only two shapes refresh_fn produces."""
        import os

        path = self._index_snapshot_path(step)
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            arrs = [z[k] for k in z.files]
        return arrs[0] if len(arrs) == 1 else tuple(arrs)

    def run(self, state: TrainState, total_steps: int, writer=None):
        """Resume note: the data stream and refresh cadence are aligned to
        the ABSOLUTE step. With ``checkpoint_index=True`` the index
        snapshot saved beside the model checkpoint is reloaded here, making
        the resumed run bit-exact with an uninterrupted one; without it the
        index is re-encoded from the restored params, so mined pools can
        differ between the resume step and the next scheduled refresh
        (tests/test_online.py::test_index_checkpoint_resume_bit_exact
        pins both behaviors)."""
        import os
        import time

        from pacednegatives_tpu.train.loop import (
            MetricWriter,
            pair_index_stream,
            save_checkpoint,
        )

        writer = writer or MetricWriter(None)
        stream = pair_index_stream(
            self.num_pairs, self.batch_size, self.seed,
            exclude=self.exclude_pairs,
        )
        start_step = int(state.step)
        for _ in range(start_step):  # resume: skip consumed batches
            next(stream)

        embeddings = None
        if self.checkpoint_index and self.checkpoint_dir and start_step:
            embeddings = self._load_index(start_step)
        if embeddings is None:
            embeddings = self.refresh_fn(state.params)
        if self.embedding_sharding is not None:
            embeddings = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.embedding_sharding)
                if x.ndim == 2
                else jax.device_put(
                    x,
                    type(self.embedding_sharding)(
                        self.embedding_sharding.mesh,
                        jax.sharding.PartitionSpec(
                            *self.embedding_sharding.spec[:1]
                        ),
                    ),
                ),
                embeddings,
            )
        carry = (state, embeddings)
        done = start_step
        last_eval = done
        last_ckpt = done
        # refresh on absolute-step boundaries so cadence survives restarts
        next_refresh = ((done // self.refresh_every) + 1) * self.refresh_every
        swap_at = None  # overlapped refresh: step at which collect() lands
        index_ckpt_step = None  # pending post-refresh index snapshot
        t0 = time.time()
        while done < total_steps:
            k = min(self.chunk_size, total_steps - done)
            idx = np.stack([next(stream) for _ in range(k)])
            carry, metrics = self._chunk_fn(carry, jnp.asarray(idx))
            done += k

            host = {m: np.asarray(v) for m, v in jax.device_get(metrics).items()}
            dt = time.time() - t0
            sps = (done - start_step) / dt if dt > 0 else 0.0
            if self.log_mode == "all":
                for t in range(k):
                    row = {m: v[t] for m, v in host.items()}
                    if t == k - 1:
                        row["steps_per_sec"] = sps
                    writer.write({"step": done - k + 1 + t, **row})
            elif self.log_mode == "mean":
                writer.write(
                    {
                        "step": done,
                        **{m: v.mean() for m, v in host.items()},
                        "steps_per_sec": sps,
                    }
                )
            else:
                writer.write(
                    {
                        "step": done,
                        **{m: v[-1] for m, v in host.items()},
                        "steps_per_sec": sps,
                    }
                )
            writer.flush()
            if (
                self.checkpoint_dir
                and self.checkpoint_every_steps
                and done - last_ckpt >= self.checkpoint_every_steps
            ):
                last_ckpt = done
                save_checkpoint(
                    os.path.join(self.checkpoint_dir, f"step_{done}"), carry[0]
                )
                # The index snapshot is written at the END of this iteration
                # (after a refresh scheduled at this same boundary has run):
                # a resumed run computes next_refresh PAST this step, so it
                # needs the post-refresh index to be bit-exact.
                index_ckpt_step = done if self.checkpoint_index else None
            if (
                self.eval_fn is not None
                and self.eval_every_steps
                and done - last_eval >= self.eval_every_steps
            ):
                last_eval = done
                ev = self.eval_fn(carry[0])
                writer.write(
                    {"step": done, **{f"eval/{k}": v for k, v in ev.items()}}
                )
                writer.flush()
            if (
                self.overlap is not None
                and swap_at is not None
                and done >= swap_at
            ):
                # overlapped refresh ready to land: assemble on the train
                # mesh (blocks only on still-outstanding encode work) and
                # swap into the carry at this chunk boundary
                state, old = carry
                embeddings = self.overlap.collect(
                    target_sharding=self.embedding_sharding, old=old
                )
                carry = (state, embeddings)
                swap_at = None
            if done >= next_refresh and done < total_steps:
                state, _old = carry
                if self.overlap is not None:
                    # dispatch on the encode submesh; training continues
                    # against the old index until the swap boundary
                    if self.overlap.in_flight:  # delay > cadence: land first
                        embeddings = self.overlap.collect(
                            target_sharding=self.embedding_sharding, old=_old
                        )
                        carry = (state, embeddings)
                    self.overlap.start(state.params)
                    swap_at = done + self.overlap_delay_chunks * self.chunk_size
                else:
                    # single-mesh: async dispatch unblocks the HOST, but the
                    # next chunk data-depends on the new embeddings, so the
                    # device still serializes behind this refresh
                    embeddings = self.refresh_fn(state.params)
                    carry = (state, embeddings)
                next_refresh += self.refresh_every
            if index_ckpt_step is not None:
                # post-refresh (see checkpoint note above); overlap +
                # checkpoint_index is rejected in __post_init__, so the
                # carry here is always the fully-settled index.
                self._save_index(carry[1], index_ckpt_step)
                index_ckpt_step = None
        if self.overlap is not None and self.overlap.in_flight:
            # don't leak an in-flight refresh past the end of the run —
            # discard() drops it without paying the full index assembly
            # nobody would read
            self.overlap.discard()
        return carry[0]
