"""Build difficulty-ordered negative pools (compute_all_bm25 parity).

Reference utilities/compute_all_bm25.py: BM25 top-``cutoff`` per train query
(dropping queries with short pools), reversed so index 0 is the EASIEST
negative. Here the retrieval runs on the in-repo native lexical index
(native/src/lexical.cpp) — or, with --method dense, on the TPU dense index
via MIPS top-k.

Usage:
  python -m pacednegatives_tpu.cli.build_pools \\
      --docs docs.tsv --queries queries.tsv --pairs pairs.tsv \\
      --out pools.jsonl --cutoff 1000
``pairs.tsv``: qid<TAB>doc_id_a rows (one positive per query); without it,
every query gets a pool and doc_id_a is left empty for downstream joining
(collate_dataset parity).
"""

from __future__ import annotations

import json
import os

from pacednegatives_tpu.utils.config import parse_cli


def main(argv=None) -> str:
    args = parse_cli(argv)
    docs, queries = args["docs"], args["queries"]
    out = args["out"]
    cutoff = int(args.get("cutoff", 1000))
    k1 = float(args.get("k1", 1.2))
    b = float(args.get("b", 0.75))
    pairs_path = args.get("pairs")
    method = args.get("method", "bm25")

    from pacednegatives_tpu.data import TextCorpus

    corpus = TextCorpus.from_tsv(docs, queries)

    pairs: dict[str, str] = {}
    if pairs_path:
        with open(pairs_path) as f:
            for line in f:
                qid, _, did = line.rstrip("\n").partition("\t")
                pairs[qid] = did

    if method == "bm25":
        from pacednegatives_tpu.index.bm25 import LexicalIndex

        ix = LexicalIndex.build(corpus.doc_texts)
        pools_iter = (
            (qid, ix.search(qtext, k=cutoff, k1=k1, b=b)[0])
            for qid, qtext in zip(corpus.query_ids, corpus.query_texts)
        )
    elif method == "dense":
        # Dense-retrieval pool building: encode corpus + queries with a
        # trained run's model, MIPS top-k on the accelerator.
        pools_iter = _dense_pools(args, corpus, cutoff)
    elif method == "splade":
        # Learned-sparse pool building (compute_all_splade.py:28-30 parity):
        # SPLADE vocab-space encoder -> quantized impact index -> top-k.
        pools_iter = _splade_pools(args, corpus, cutoff)
    else:
        raise SystemExit(f"unknown method {method}")

    n_written = n_skipped = 0
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        for qid, ids in pools_iter:
            if len(ids) < cutoff:
                # keep only full pools (compute_all_bm25.py:38-40)
                n_skipped += 1
                continue
            pool = [corpus.doc_ids[d] for d in ids[:cutoff]][::-1]  # easy first
            rec = {
                "query_id": qid,
                "doc_id_a": pairs.get(qid, ""),
                "doc_id_b": pool,
            }
            f.write(json.dumps(rec) + "\n")
            n_written += 1

    print(json.dumps({"written": n_written, "skipped_short": n_skipped, "out": out}))
    return out


def _dense_pools(args: dict, corpus, cutoff: int):
    import numpy as np

    import jax.numpy as jnp

    from pacednegatives_tpu.data import TokenizedStore
    from pacednegatives_tpu.index import DenseIndex
    from pacednegatives_tpu.models.dual_encoder import encode_corpus
    from pacednegatives_tpu.train.runner import load_run

    run_dir = args.get("run")
    if not run_dir:
        raise SystemExit("--method dense needs --run <trained run dir>")
    params, mcfg, tok, rc = load_run(run_dir)
    store = TokenizedStore.build(
        corpus, tok, max_q_tokens=rc.max_q_tokens, max_d_tokens=rc.max_d_tokens
    )
    d_emb = encode_corpus(
        params, mcfg, jnp.asarray(store.d_tokens), jnp.asarray(store.d_mask),
        batch_size=int(args.get("encode_batch", 256)),
    )
    q_emb = encode_corpus(
        params, mcfg, jnp.asarray(store.q_tokens), jnp.asarray(store.q_mask),
        batch_size=int(args.get("encode_batch", 256)),
    )
    index = DenseIndex.build(d_emb, method=args.get("topk", "exact"))
    B = 64
    for s in range(0, corpus.num_queries, B):
        e = min(s + B, corpus.num_queries)
        _, idx = index.topk(q_emb[s:e], min(cutoff, corpus.num_docs))
        idx = np.asarray(idx)
        for row, qid in enumerate(corpus.query_ids[s:e]):
            yield qid, idx[row]


def _splade_pools(args: dict, corpus, cutoff: int):
    """SPLADE-style learned-sparse pools: the reranker encoder's vocab-space
    activations (models/splade.py) feed a quantized impact index
    (index/sparse.py) — the in-repo equivalent of the reference's SPLADE
    query encoder over a PISA quantized index."""
    import numpy as np

    import jax.numpy as jnp

    from pacednegatives_tpu.data import TokenizedStore
    from pacednegatives_tpu.index.sparse import SparseIndex
    from pacednegatives_tpu.models.splade import encode_corpus_sparse
    from pacednegatives_tpu.train.runner import load_run

    run_dir = args.get("run")
    if not run_dir:
        raise SystemExit("--method splade needs --run <trained run dir>")
    params, mcfg, tok, rc = load_run(run_dir)
    store = TokenizedStore.build(
        corpus, tok, max_q_tokens=rc.max_q_tokens, max_d_tokens=rc.max_d_tokens
    )
    topk_terms = int(args.get("splade_terms", 128))
    batch = int(args.get("encode_batch", 64))
    d_w, d_t = encode_corpus_sparse(
        params, mcfg, jnp.asarray(store.d_tokens), jnp.asarray(store.d_mask),
        k=topk_terms, batch_size=batch,
    )
    index = SparseIndex.build(
        np.asarray(d_t), np.asarray(d_w), num_terms=mcfg.vocab_size,
        quantize=args.get("quantize", "1") not in ("0", "false", "False"),
    )
    q_w, q_t = encode_corpus_sparse(
        params, mcfg, jnp.asarray(store.q_tokens), jnp.asarray(store.q_mask),
        k=topk_terms, batch_size=batch,
    )
    q_w, q_t = np.asarray(q_w), np.asarray(q_t)
    for row, qid in enumerate(corpus.query_ids):
        ids, _ = index.search(q_t[row], q_w[row], k=min(cutoff, corpus.num_docs))
        yield qid, ids


if __name__ == "__main__":
    main()
