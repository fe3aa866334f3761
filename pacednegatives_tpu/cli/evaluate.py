"""Evaluate trained rerankers: BM25 first stage -> monoT5 rerank -> paired
metrics vs a baseline run (reference eval.py parity).

Usage:
  python -m pacednegatives_tpu.cli.evaluate \\
      --docs docs.tsv --queries queries.tsv --qrels qrels.tsv \\
      --model_dir runs/ --baseline runs/baseline --out results/
``--model_dir`` evaluates every run subdirectory (eval.py:17-38); ``--model``
evaluates one. qrels TSV: qid<TAB>doc_id<TAB>rel (3-col) or TREC 4-col.
"""

from __future__ import annotations

import csv
import json
import os
from os.path import isdir, join

from pacednegatives_tpu.utils.config import parse_cli

METRICS = ("map", "ndcg_cut_10", "recip_rank")  # eval.py:26


def load_qrels(path: str) -> dict[str, dict[str, int]]:
    qrels: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 4:  # TREC: qid iter doc rel
                qid, _, did, rel = parts
            elif len(parts) == 3:
                qid, did, rel = parts
            else:
                continue
            qrels.setdefault(qid, {})[did] = int(rel)
    return qrels


def _write_rows(path: str, rows: list[dict]) -> None:
    keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)


def main(argv=None) -> list[dict]:
    args = parse_cli(argv)
    out = args["out"]
    os.makedirs(out, exist_ok=True)
    qrels = load_qrels(args["qrels"])
    depth = int(args.get("depth", 100))
    bm25_k = int(args.get("bm25_k", 1000))

    from pacednegatives_tpu.data import TextCorpus
    from pacednegatives_tpu.eval import Reranker, experiment
    from pacednegatives_tpu.index.bm25 import LexicalIndex
    from pacednegatives_tpu.train.runner import load_run

    corpus = TextCorpus.from_tsv(args["docs"], args["queries"])
    ix = LexicalIndex.build(corpus.doc_texts)

    # first stage over judged queries
    first: dict[str, list[str]] = {}
    for qid in corpus.query_ids:
        if qid not in qrels:
            continue
        ids, _ = ix.search(corpus.query_text(qid), k=bm25_k)
        first[qid] = [corpus.doc_ids[d] for d in ids]

    def rerank_with(run_dir: str):
        params, mcfg, tok, _rc = load_run(run_dir)
        from pacednegatives_tpu.data import TokenizedStore

        store = TokenizedStore.build(
            corpus, tok, max_q_tokens=_rc.max_q_tokens, max_d_tokens=_rc.max_d_tokens
        )
        # serve with the layout the model was TRAINED with (packed vs
        # segment positions differ — data/device_corpus.py); packed runs
        # also get length buckets: identical scores (tests/test_packed.py
        # invariance), fewer padded-out FLOPs on real-length corpora
        packed = getattr(_rc, "packed_assembly", False)
        L = store.prompt_len
        rr = Reranker(
            params, mcfg, store, corpus,
            rel_id=tok.true_id, nrel_id=tok.false_id,
            packed=packed,
            bucket_lens=tuple(range(32, L, 32)) if packed else None,
            # --int8: serve with the W8A8 dynamic-quant forward (2x MXU
            # peak; rank fidelity pinned in tests/test_quant.py)
            int8=args.get("int8", "false").lower() in ("1", "true", "yes"),
        )
        return rr.rerank(first, depth=depth)

    runs: dict[str, dict] = {"bm25": first}
    baseline_name = "bm25"
    if args.get("baseline"):
        runs["baseline"] = rerank_with(args["baseline"])
        baseline_name = "baseline"

    if args.get("model"):
        runs[os.path.basename(args["model"].rstrip("/"))] = rerank_with(args["model"])
    elif args.get("model_dir"):
        root = args["model_dir"]
        for name in sorted(os.listdir(root)):
            d = join(root, name)
            if isdir(d) and os.path.exists(join(d, "config.json")):
                try:
                    runs[name] = rerank_with(d)
                except Exception as e:  # eval.py:27-29 skip-on-error parity
                    print(f"Error in {name}: {type(e).__name__}: {e}")

    if args.get("save_runs", "false").lower() in ("1", "true", "yes"):
        from pacednegatives_tpu.eval import write_trec_run

        for name, r in runs.items():
            write_trec_run(join(out, f"{name}.run"), r, tag=name)

    rows = experiment(runs, qrels, metrics=METRICS, baseline=baseline_name)
    _write_rows(join(out, "results.csv"), rows)

    if args.get("perquery", "false").lower() in ("1", "true", "yes"):
        # per-query long format (eval.py:45-46 perquery parity)
        from pacednegatives_tpu.eval import evaluate_run

        pq_rows = []
        for name, r in runs.items():
            per = evaluate_run(r, qrels, METRICS)
            for m, by_q in per.items():
                for qid, val in by_q.items():
                    pq_rows.append(
                        {"name": name, "qid": qid, "measure": m, "value": val}
                    )
        _write_rows(join(out, "perqueryresults.csv"), pq_rows)

    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
