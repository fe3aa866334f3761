"""monoT5 reranking of a first-stage run.

Replaces the reference's PyTerrier pipeline ``bm25 >> get_text >>
MonoT5ReRanker`` (eval.py:14,23): takes a first-stage run {qid: [doc_id...]},
scores every (query, doc) prompt with the trained model in fixed-size device
batches, and returns the rerank.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pacednegatives_tpu.data.corpus import TextCorpus
from pacednegatives_tpu.data.pipeline import TokenizedStore
from pacednegatives_tpu.models import t5
from pacednegatives_tpu.models.monot5 import score_batch


@dataclasses.dataclass
class Reranker:
    params: object
    cfg: t5.T5Config
    store: TokenizedStore
    corpus: TextCorpus
    rel_id: int
    nrel_id: int
    batch_size: int = 64
    # packed=True serves CONTIGUOUS prompts (pads only at the tail —
    # TokenizedStore.assemble_host_packed): required for models trained
    # with packed/pretrained positions, and the enabler for bucketing.
    packed: bool = False
    # With packed=True, score each batch at the smallest of these sequence
    # lengths that fits its longest pair (pairs are sorted by true length
    # first, so batches are length-homogeneous). One XLA compile per bucket
    # actually used; scoring FLOPs scale with the bucket, not the corpus
    # max — the classic serving win on real-length corpora. None = always
    # the full prompt length.
    bucket_lens: tuple[int, ...] | None = None
    # int8=True serves with the W8A8 dynamic-quant forward (models/quant.py;
    # 2x MXU peak on v5e). Params are quantized ONCE at construction —
    # serving-style frozen model. Rank fidelity pinned in tests/test_quant.py;
    # composes with packed/bucketed serving (both paths take a mask).
    int8: bool = False

    def __post_init__(self):
        cfg, rel, nrel = self.cfg, self.rel_id, self.nrel_id
        if self.int8:
            from pacednegatives_tpu.models.quant import (
                quantize_scoring_params,
                score_batch_int8,
            )

            self.params = jax.jit(
                lambda p: quantize_scoring_params(p, cfg)
            )(self.params)
            score_fn = score_batch_int8
        else:
            score_fn = score_batch

        @jax.jit
        def score(params, ids, mask):
            return score_fn(params, cfg, ids, mask, rel_id=rel, nrel_id=nrel)

        self._score = score

    def _score_block(
        self, qs: np.ndarray, ds: np.ndarray, out_len: int | None
    ) -> np.ndarray:
        """Score one <=batch_size block (padded to the jitted batch shape)."""
        m = len(qs)
        B = self.batch_size
        if m < B:
            padn = B - m
            qs = np.concatenate([qs, np.repeat(qs[-1:], padn)])
            ds = np.concatenate([ds, np.repeat(ds[-1:], padn)])
        if self.packed:
            ids, mask = self.store.assemble_host_packed(qs, ds, out_len)
        else:
            ids, mask = self.store.assemble_host(qs, ds)
        scores = np.asarray(
            self._score(self.params, jnp.asarray(ids), jnp.asarray(mask))
        )
        return scores[:m]

    def _bucket_plan(
        self, q_rows: np.ndarray, d_rows: np.ndarray
    ) -> list[tuple[np.ndarray, int]]:
        """Sort pairs by true length into length-homogeneous <=batch_size
        blocks; give each block the smallest bucket that fits its longest
        pair (the full prompt length is always the fallback bucket).
        Returns [(index_block, out_len), ...]."""
        B = self.batch_size
        L = self.store.prompt_len
        lens = self.store.pair_lengths(q_rows, d_rows)
        order = np.argsort(lens, kind="stable")
        buckets = sorted({min(b, L) for b in self.bucket_lens} | {L})
        plan = []
        for s in range(0, len(q_rows), B):
            blk = order[s : s + B]
            need = int(lens[blk].max())
            plan.append((blk, next(b for b in buckets if b >= need)))
        return plan

    def warm(self, q_rows: np.ndarray, d_rows: np.ndarray) -> list[int]:
        """Pre-compile every program this pair set will need (one XLA
        compile per distinct bucket length) so scoring latency is
        compile-free — call before serving traffic or timing. Returns the
        distinct bucket lengths compiled.

        Each warm block is a row PERMUTATION of a representative block from
        the plan: the permuted pairs still fit the same bucket, but the
        input bytes differ from any block score_pairs will later submit, so
        an execution-dedup layer (the tunneled-TPU pitfall) cannot satisfy
        a timed block from the warm run's result."""
        perm = np.random.default_rng(0x5EED).permutation
        if self.packed and self.bucket_lens:
            seen: dict[int, np.ndarray] = {}
            for blk, out_len in self._bucket_plan(q_rows, d_rows):
                seen.setdefault(out_len, blk)
            for out_len, blk in seen.items():
                p = perm(len(blk))
                self._score_block(q_rows[blk][p], d_rows[blk][p], out_len)
            return sorted(seen)
        B = min(self.batch_size, len(q_rows))
        p = perm(B)
        self._score_block(q_rows[:B][p], d_rows[:B][p], None)
        return [self.store.prompt_len]

    def score_pairs(self, q_rows: np.ndarray, d_rows: np.ndarray) -> np.ndarray:
        """(M,) query rows x (M,) doc rows -> (M,) relevance log-probs."""
        M = len(q_rows)
        B = self.batch_size
        out = np.zeros(M, np.float32)
        if self.packed and self.bucket_lens:
            for blk, out_len in self._bucket_plan(q_rows, d_rows):
                out[blk] = self._score_block(
                    q_rows[blk], d_rows[blk], out_len
                )
            return out
        for s in range(0, M, B):
            e = min(s + B, M)
            out[s:e] = self._score_block(
                q_rows[s:e], d_rows[s:e], None
            )
        return out

    def rerank(
        self, run: Mapping[str, Sequence[str]], depth: int | None = None
    ) -> dict[str, list[str]]:
        """Rerank each query's candidate list by model score (desc)."""
        # flatten into one scoring pass for device efficiency
        q_rows, d_rows, owners = [], [], []
        items: list[tuple[str, list[str]]] = []
        for qid, docs in run.items():
            docs = list(docs)[: depth or len(docs)]
            items.append((qid, docs))
            for d in docs:
                q_rows.append(self.corpus.query_index[qid])
                d_rows.append(self.corpus.doc_index[d])
                owners.append(qid)
        scores = self.score_pairs(
            np.asarray(q_rows, np.int64), np.asarray(d_rows, np.int64)
        )

        out: dict[str, list[str]] = {}
        pos = 0
        for qid, docs in items:
            s = scores[pos : pos + len(docs)]
            pos += len(docs)
            order = np.argsort(-s, kind="stable")
            out[qid] = [docs[i] for i in order]
        return out
