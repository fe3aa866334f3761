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
from pacednegatives_tpu.models.monot5 import relevance_log_probs


@dataclasses.dataclass
class Reranker:
    params: object
    cfg: t5.T5Config
    store: TokenizedStore
    corpus: TextCorpus
    rel_id: int
    nrel_id: int
    batch_size: int = 64

    def __post_init__(self):
        cfg, rel, nrel = self.cfg, self.rel_id, self.nrel_id

        @jax.jit
        def score(params, ids, mask):
            enc = t5.encode(params, cfg, ids, mask)
            dec_in = jnp.zeros((ids.shape[0], 1), jnp.int32) + cfg.decoder_start_token_id
            logits = t5.decode(params, cfg, dec_in, enc, mask)
            return relevance_log_probs(logits[:, 0, :], rel, nrel)

        self._score = score

    def score_pairs(self, q_rows: np.ndarray, d_rows: np.ndarray) -> np.ndarray:
        """(M,) query rows x (M,) doc rows -> (M,) relevance log-probs."""
        M = len(q_rows)
        B = self.batch_size
        out = np.zeros(M, np.float32)
        for s in range(0, M, B):
            e = min(s + B, M)
            qs, ds = q_rows[s:e], d_rows[s:e]
            if e - s < B:  # pad to the jitted batch shape
                padn = B - (e - s)
                qs = np.concatenate([qs, np.repeat(qs[-1:], padn)])
                ds = np.concatenate([ds, np.repeat(ds[-1:], padn)])
            ids, mask = self.store.assemble_host(qs, ds)
            scores = np.asarray(
                self._score(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )
            out[s:e] = scores[: e - s]
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
