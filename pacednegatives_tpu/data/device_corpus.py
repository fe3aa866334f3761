"""Device-resident corpus: the hot training loop never touches the host.

The flagship TPU-native inversion of the reference's data path. The
reference's hot loop crosses host<->device every step: DataLoader worker
processes sample negatives with scipy on CPU, tokenize strings, pin memory,
copy to GPU (lceT5.py:66-67, dataloader.py:134-162). Here the ENTIRE corpus
lives in HBM as pre-tokenized token matrices; batch assembly — difficulty ->
binomial sampling -> pool gather -> prompt concat -> labels — is pure jitted
gathers/concats on device, so the step function (and the whole training run
via lax.scan) runs without host synchronization.

Memory: MS MARCO passage (8.8M docs x 180 tokens) stores as int16 when the
vocab fits 15 bits (t5's 32128 does; compact_tokens=True default) — ~3.2GB,
fitting one v5e HBM (16GB) next to a t5-base with room for the int8 online
index; sharding the doc matrix over the ``data`` mesh axis divides this per
chip. Gathers cast back to int32 in registers (assemble()).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pacednegatives_tpu.data.pipeline import TokenizedStore
from pacednegatives_tpu.data.triples import TripletStore
from pacednegatives_tpu.ops.sampling import (
    difficulty_to_index,
    sample_pool_indices_batch,
)


@dataclasses.dataclass
class DeviceCorpus:
    """Token matrices + triple/pool structure as device arrays.

    Registered as a JAX pytree (arrays = children, ids/flags = static aux)
    so a corpus can cross a ``jit`` boundary as a runtime ARGUMENT. Closing
    over the arrays instead would bake them into the HLO as literal
    constants — at MS MARCO scale that is a multi-hundred-MB computation
    proto per compile (and a hard failure on remote-compile transports).
    Loop-level jits (TrainLoop/OnlineMiningLoop/bench) therefore thread the
    corpus through as an explicit parameter.
    """

    q_tokens: jax.Array  # (Nq, Lq) int32
    # masks are DERIVED from tokens != pad by default (None): storing them
    # costs a full (N, L) int8 matrix (1.6 GB at MS MARCO scale) and an
    # extra gather per batch for information the token matrix already
    # carries. Explicit masks remain supported for corpora whose padding
    # is not representable as a pad-token test.
    q_mask: jax.Array | None
    d_tokens: jax.Array  # (Nd, Ld) int32
    d_mask: jax.Array | None
    query_rows: jax.Array  # (Np,) int32 — per pair
    pos_rows: jax.Array  # (Np,) int32
    pools: jax.Array  # (Np, n_neg) int32
    prefix: jax.Array  # (Lp,) int32
    mid: jax.Array
    suffix: jax.Array
    pad_id: int
    true_id: int
    false_id: int
    eos_id: int
    # ceil instead of floor for difficulty -> pool index (reference
    # TripletDataset max flag, dataloader.py:22)
    use_max: bool = False
    # packed=True compacts each assembled prompt's real tokens to the front
    # (pads only at the tail) — the positional geometry of the reference,
    # which tokenizes whole prompt strings (lceT5.py:40-53) so query/doc/
    # suffix tokens are contiguous. The segment layout (default) is the
    # static-shape-native choice and self-consistent for from-scratch
    # training; packed is REQUIRED when fine-tuning/serving an imported
    # pretrained checkpoint (contiguous positions are its distribution).
    # Train and serve must use the same setting.
    packed: bool = False

    @classmethod
    def build(
        cls, store: TokenizedStore, triples: TripletStore, device=None,
        use_max: bool = False, compact_tokens: bool = True,
        store_masks: bool = False, packed: bool = False,
    ) -> "DeviceCorpus":
        put = partial(jax.device_put, device=device)
        t = store.template
        # int16 token storage halves corpus HBM when the vocab fits
        # (t5's 32128 does); gathers cast back to int32 in registers.
        tok_dtype = np.int32
        if compact_tokens:
            if (store.q_tokens.dtype == np.int16
                    and store.d_tokens.dtype == np.int16):
                tok_dtype = np.int16  # already compact: skip the full scan
            elif max(store.q_tokens.max(initial=0),
                     store.d_tokens.max(initial=0)) < 2**15:
                tok_dtype = np.int16
        if store_masks and (store.q_mask is None or store.d_mask is None):
            raise ValueError(
                "store_masks=True but the TokenizedStore carries no mask "
                "matrices (streaming builder); its masks are pad-derived "
                "by construction — build with store_masks=False"
            )
        if not store_masks and store.q_mask is not None:
            # token-derived masks require pad positions to hold pad_id;
            # a ValueError (not assert) so the check survives python -O —
            # silently wrong attention masks are the worst failure mode
            # here. (Mask-less stores skip the scan: the streaming writer
            # pads with pad_id by construction.)
            if not (store.q_tokens[store.q_mask == 0] == store.pad_id).all() \
                    or not (
                        store.d_tokens[store.d_mask == 0] == store.pad_id
                    ).all():
                raise ValueError(
                    "store_masks=False requires every padded position to "
                    "hold pad_id (masks are re-derived as tokens != pad_id "
                    "on device); this store has non-pad tokens at masked "
                    "positions — build with store_masks=True instead"
                )
        return cls(
            # copy=False: a memmap-backed or already-compact token matrix
            # must not be duplicated in host RAM on its way to the device
            q_tokens=put(store.q_tokens.astype(tok_dtype, copy=False)),
            q_mask=put(store.q_mask.astype(np.int8)) if store_masks else None,
            d_tokens=put(store.d_tokens.astype(tok_dtype, copy=False)),
            d_mask=put(store.d_mask.astype(np.int8)) if store_masks else None,
            query_rows=put(triples.query_rows),
            pos_rows=put(triples.pos_rows),
            pools=put(triples.pools),
            prefix=put(np.asarray(t.prefix, np.int32)),
            mid=put(np.asarray(t.mid, np.int32)),
            suffix=put(np.asarray(t.suffix, np.int32)),
            pad_id=store.pad_id,
            true_id=store.true_id,
            false_id=store.false_id,
            eos_id=store.eos_id,
            use_max=use_max,
            packed=packed,
        )

    # -- jittable assembly ---------------------------------------------------

    @property
    def num_pairs(self) -> int:
        return self.query_rows.shape[0]

    @property
    def n_neg(self) -> int:
        return self.pools.shape[1]

    def _masked(self, tokens_i32: jax.Array, mask_table, rows) -> jax.Array:
        """Mask for gathered tokens: stored table if present, else derived
        from the already-gathered tokens (no second gather, no stored
        (N, L) mask matrix)."""
        if mask_table is not None:
            return mask_table[rows].astype(jnp.int32)
        return (tokens_i32 != self.pad_id).astype(jnp.int32)

    def assemble(self, q_rows: jax.Array, d_rows: jax.Array):
        """(B,) query rows x (B,) doc rows -> (B, L) ids, mask. Pure gathers."""
        B = q_rows.shape[0]
        tile = lambda seg: jnp.broadcast_to(seg, (B, seg.shape[0]))
        ones = lambda seg: jnp.ones((B, seg.shape[0]), jnp.int32)
        q_tok = self.q_tokens[q_rows].astype(jnp.int32)
        d_tok = self.d_tokens[d_rows].astype(jnp.int32)
        ids = jnp.concatenate(
            [tile(self.prefix), q_tok, tile(self.mid), d_tok,
             tile(self.suffix)],
            axis=1,
        )
        mask = jnp.concatenate(
            [
                ones(self.prefix),
                self._masked(q_tok, self.q_mask, q_rows),
                ones(self.mid),
                self._masked(d_tok, self.d_mask, d_rows),
                ones(self.suffix),
            ],
            axis=1,
        )
        if self.packed:
            # compact real tokens to the front (stable: order preserved);
            # pads are normalized to pad_id so token-derived masks keep
            # working downstream. Cost is one (B, L) sort per assembly —
            # noise next to the model forward it feeds.
            order = jnp.argsort(mask == 0, axis=1, stable=True)
            ids = jnp.take_along_axis(ids, order, axis=1)
            mask = jnp.take_along_axis(mask, order, axis=1)
            ids = jnp.where(mask == 1, ids, self.pad_id)
        return ids, mask

    def labels(self, B: int, positive: bool) -> jax.Array:
        tok = self.true_id if positive else self.false_id
        return jnp.broadcast_to(
            jnp.array([tok, self.eos_id], jnp.int32), (B, 2)
        )

    def pair_batch(self, pair_idx: jax.Array, difficulty: jax.Array):
        """Single-negative batch at a difficulty level (reference
        TripletDataset.get_items + LevelLoader.get_batch path).

        pair_idx: (B,) rows into the triple store. Returns dict with pos/neg
        prompt ids+masks and labels.
        """
        q = self.query_rows[pair_idx]
        pos_d = self.pos_rows[pair_idx]
        neg_slot = difficulty_to_index(difficulty, self.n_neg, self.use_max)
        neg_d = self.pools[pair_idx, neg_slot]

        pos_ids, pos_mask = self.assemble(q, pos_d)
        neg_ids, neg_mask = self.assemble(q, neg_d)
        B = pair_idx.shape[0]
        denom = max(self.n_neg - 1, 1)
        return {
            "pos_ids": pos_ids,
            "pos_mask": pos_mask,
            "pos_labels": self.labels(B, True),
            "neg_ids": neg_ids,
            "neg_mask": neg_mask,
            "neg_labels": self.labels(B, False),
            # normalized pool position of the drawn negatives (0 = easiest,
            # 1 = hardest) — observability for the pacing feedback
            "neg_rank": jnp.broadcast_to(
                neg_slot.astype(jnp.float32) / denom, (B,)
            ),
        }

    def replace(self, **kw) -> "DeviceCorpus":
        return dataclasses.replace(self, **kw)

    def lce_batch(
        self,
        key: jax.Array,
        pair_idx: jax.Array,
        difficulty: jax.Array,
        n: int,
    ):
        """LCE batch: n binomially-sampled negatives per pair (reference
        LCEDataset.__getitem__ + collate, dataloader.py:134-162).

        Negative prompts are flattened to (B*n, L) in example-major order,
        matching itertools.chain(*neg) in the reference collate
        (lceT5.py:43-45).
        """
        B = pair_idx.shape[0]
        q = self.query_rows[pair_idx]
        pos_d = self.pos_rows[pair_idx]

        slots = sample_pool_indices_batch(
            key, self.n_neg, jnp.broadcast_to(difficulty, (B,)), n
        )  # (B, n)
        neg_d = jnp.take_along_axis(self.pools[pair_idx], slots, axis=1)  # (B, n)

        pos_ids, pos_mask = self.assemble(q, pos_d)
        q_rep = jnp.repeat(q, n)
        neg_ids, neg_mask = self.assemble(q_rep, neg_d.reshape(-1))
        return {
            "pos_ids": pos_ids,
            "pos_mask": pos_mask,
            "pos_labels": self.labels(B, True),
            "neg_ids": neg_ids,
            "neg_mask": neg_mask,
            "neg_labels": self.labels(B * n, False),
            "neg_rank": (
                slots.astype(jnp.float32) / max(self.n_neg - 1, 1)
            ).reshape(-1),
        }


jax.tree_util.register_dataclass(
    DeviceCorpus,
    data_fields=[
        "q_tokens", "q_mask", "d_tokens", "d_mask",
        "query_rows", "pos_rows", "pools", "prefix", "mid", "suffix",
    ],
    meta_fields=["pad_id", "true_id", "false_id", "eos_id", "use_max",
                 "packed"],
)
