"""MS MARCO end-metric parity run — activates when real inputs are mounted.

The reference's headline result is a monoT5 reranker trained FROM PRETRAINED
t5-base on MS MARCO passage triples and evaluated with
BM25 >> rerank >> {MRR@10, nDCG@10, MAP} (reference train/train_lce.py:55,
eval.py:12-26). This build environment has no network egress and no HF cache,
so that run cannot execute here; this script is the ready-to-go recipe that
runs it end to end the moment the two inputs exist:

  1. a local t5-base checkpoint directory (HF format — config.json +
     pytorch_model.bin/model.safetensors + spiece.model), passed as
     --checkpoint; loaded through models/hf_import.load_hf_checkpoint.
  2. MS MARCO passage data as the TSV interchange in --data_dir:
     docs.tsv, queries.tsv (train), eval_queries.tsv + qrels.tsv (dev/DL19),
     pairs.tsv (positives). With ir_datasets installed, pass
     --ir_dataset msmarco-passage/train/triples-small (and --eval_ir_dataset)
     instead and the adapter exports these files first.

Stages (each skipped if its output already exists, so the run is resumable):
  pools  — cli.build_pools: BM25 top-1000 per train query, easiest-first
           (compute_all_bm25.py parity)
  train  — cli.train with reference train_lce defaults (t5-base, batch 16,
           lr 1e-3, n=2, use_mean=False, 100k examples, warmup 10k;
           override via --total_steps etc.); ce_scale is forced to 1.0
           because pretrained verbalizer CE is already O(1) — the
           reference-exact feedback regime
  eval   — cli.evaluate: BM25 >> rerank >> map/ndcg_cut_10/recip_rank with a
           paired t-test vs the BM25 baseline (eval.py parity); results
           land in <out>/results.csv + parity_report.json

Usage:
  python scripts/msmarco_parity.py --checkpoint /mnt/t5-base \
      --data_dir /mnt/msmarco --out runs/msmarco_parity \
      [--curriculum lce|eta|level|interp] [--total_steps 100000]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pacednegatives_tpu.utils.config import parse_cli


def _require(path: str, what: str, missing: list[str]) -> None:
    if not os.path.exists(path):
        missing.append(f"  {what}: {path}")


def main(argv=None) -> dict:
    args = parse_cli(argv)
    ckpt = args.get("checkpoint", "")
    data_dir = args.get("data_dir", "")
    out = args.get("out", "runs/msmarco_parity")
    curriculum = args.get("curriculum", "lce")

    if args.get("ir_dataset"):
        from pacednegatives_tpu.data.ir_datasets_adapter import export_ir_dataset

        data_dir = data_dir or os.path.join(out, "data")
        export_ir_dataset(args["ir_dataset"], data_dir)
        if args.get("eval_ir_dataset"):
            eval_dir = os.path.join(out, "eval_data")
            p = export_ir_dataset(args["eval_ir_dataset"], eval_dir)
            os.replace(p["queries"], os.path.join(data_dir, "eval_queries.tsv"))
            if "qrels" in p:
                os.replace(p["qrels"], os.path.join(data_dir, "qrels.tsv"))

    docs = os.path.join(data_dir, "docs.tsv")
    queries = os.path.join(data_dir, "queries.tsv")
    pairs = os.path.join(data_dir, "pairs.tsv")
    eval_queries = os.path.join(data_dir, "eval_queries.tsv")
    qrels = os.path.join(data_dir, "qrels.tsv")

    missing: list[str] = []
    _require(os.path.join(ckpt, "config.json") if ckpt else "",
             "t5-base checkpoint dir (--checkpoint)", missing)
    for p, what in ((docs, "corpus"), (queries, "train queries"),
                    (pairs, "positives"), (eval_queries, "eval queries"),
                    (qrels, "qrels")):
        _require(p, what, missing)
    if missing:
        print("msmarco_parity: NOT RUN — missing inputs:")
        print("\n".join(missing))
        print(__doc__)
        return {"ran": False, "missing": missing}

    os.makedirs(out, exist_ok=True)

    # ---- stage 1: difficulty-ordered pools -------------------------------
    pools = os.path.join(out, "pools.jsonl")
    if not os.path.exists(pools):
        from pacednegatives_tpu.cli.build_pools import main as build_pools

        build_pools([
            "--docs", docs, "--queries", queries, "--pairs", pairs,
            "--out", pools, "--cutoff", str(args.get("cutoff", 1000)),
        ])

    # ---- stage 2: curriculum training from the pretrained checkpoint -----
    run_dir = os.path.join(out, f"run_{curriculum}")
    if not os.path.exists(os.path.join(run_dir, "final")):
        from pacednegatives_tpu.cli.train import main as train

        # --tokenizer defaults to the checkpoint dir (HF spiece vocab);
        # override with a TrainedTokenizer .json for offline smoke tests
        tokenizer = args.get("tokenizer", ckpt)
        train_args = [
            "--model", ckpt, "--tokenizer", tokenizer,
            "--curriculum", curriculum,
            "--triples", pools, "--docs", docs, "--queries", queries,
            "--out_dir", run_dir,
            # reference train_lce.py defaults (train_lce.py:23-33)
            "--total_steps", str(args.get("total_steps", 100_000)),
            "--batch_size", str(args.get("batch_size", 16)),
            "--lr", str(args.get("lr", 1e-3)),
            "--n", str(args.get("n", 2)),
            "--warmup_steps", str(args.get("warmup_steps", 10_000)),
            "--use_mean", "false",
            "--eta0", str(args.get("eta0", 0.0 if curriculum == "lce" else 0.5)),
            # pretrained verbalizer CE is O(1): reference-exact feedback scale
            "--ce_scale", "1.0",
            # pretrained T5 was trained on CONTIGUOUS text: packed assembly
            # reproduces the reference's whole-string tokenization geometry
            # (lceT5.py:40-53) instead of the segment layout's interior pad
            # gaps; evaluate() serves with the same layout via the saved
            # RunConfig (cli/evaluate.py)
            "--packed_assembly", "true",
        ]
        train(argv=train_args)

    # ---- stage 3: BM25 >> rerank >> paired metrics ------------------------
    from pacednegatives_tpu.cli.evaluate import main as evaluate

    results = evaluate([
        "--docs", docs, "--queries", eval_queries, "--qrels", qrels,
        "--model", run_dir, "--out", os.path.join(out, "eval"),
    ])

    report = {
        "ran": True,
        "curriculum": curriculum,
        "checkpoint": ckpt,
        "results": results,
        "reference_targets": "MS MARCO dev MRR@10 / nDCG@10 parity "
                             "(BASELINE.json north star)",
    }
    with open(os.path.join(out, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
