"""The full user journey through the CLI surfaces, as a reference user would
run it: train a tokenizer, build BM25 pools, train with a curriculum,
export to HF format, evaluate against the BM25 baseline, mine distillation
triples, score teachers, distill. One tiny corpus end to end."""

import json
import os

import numpy as np
import pytest

from pacednegatives_tpu.data import TextCorpus


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("journey")
    corpus = TextCorpus.synthetic(num_docs=48, num_queries=8, seed=7)
    docs, queries = str(d / "docs.tsv"), str(d / "queries.tsv")
    with open(docs, "w") as f:
        for i, t in zip(corpus.doc_ids, corpus.doc_texts):
            f.write(f"{i}\t{t}\n")
    with open(queries, "w") as f:
        for i, t in zip(corpus.query_ids, corpus.query_texts):
            f.write(f"{i}\t{t}\n")
    pairs = str(d / "pairs.tsv")
    with open(pairs, "w") as f:
        for q in range(8):
            f.write(f"q{q}\td{q}\n")
    qrels = str(d / "qrels.tsv")
    with open(qrels, "w") as f:
        for q in range(8):
            for doc in range(q, 48, 8):
                f.write(f"q{q}\td{doc}\t1\n")
    return d, docs, queries, pairs, qrels


def test_full_journey(workspace):
    d, docs, queries, pairs, qrels = workspace

    # 1. train a tokenizer on the corpus
    from pacednegatives_tpu.cli.train_tokenizer import main as tok_main

    tok_path = str(d / "tok.json")
    tok_main(["--docs", docs, "--queries", queries, "--out", tok_path,
              "--vocab_size", "300"])

    # 2. build BM25 pools
    from pacednegatives_tpu.cli.build_pools import main as pools_main

    pools = str(d / "pools.jsonl")
    pools_main(["--docs", docs, "--queries", queries, "--pairs", pairs,
                "--out", pools, "--cutoff", "8"])

    # 3. train with the lce curriculum on those pools + tokenizer
    from pacednegatives_tpu.cli.train import main as train_main

    run_dir = str(d / "run")
    summary = train_main(argv=[
        "--curriculum", "lce", "--n", "2", "--eta0", "8.0",
        "--docs", docs, "--queries", queries, "--triples", pools,
        "--tokenizer", tok_path, "--model", "tiny", "--bf16", "false",
        "--remat", "false", "--max_q_tokens", "8", "--max_d_tokens", "24",
        "--total_steps", "24", "--warmup_steps", "4", "--batch_size", "4",
        "--chunk_size", "3", "--export_hf", "true", "--out_dir", run_dir,
    ])
    assert summary["steps"] == 6
    assert os.path.exists(os.path.join(run_dir, "model", "config.json"))

    # 4. evaluate vs the BM25 baseline (paired metrics)
    from pacednegatives_tpu.cli.evaluate import main as eval_main

    rows = eval_main([
        "--docs", docs, "--queries", queries, "--qrels", qrels,
        "--out", str(d / "eval"), "--model", run_dir,
        "--depth", "10", "--bm25_k", "20", "--perquery", "true",
    ])
    names = {r["name"] for r in rows}
    assert "bm25" in names and "run" in names
    assert os.path.exists(str(d / "eval" / "results.csv"))
    assert os.path.exists(str(d / "eval" / "perqueryresults.csv"))

    # 5. distillation chain: mine -> teacher scores -> distill
    from pacednegatives_tpu.cli.mine_negatives import main as mine_main

    triples_tsv = str(d / "triples.tsv")
    mine_main(["--docs", docs, "--queries", queries, "--pairs", pairs,
               "--out", triples_tsv, "--budget", "16"])

    from pacednegatives_tpu.cli.teacher_scores import main as teach_main

    teacher = str(d / "teacher.json")
    teach_main(["--docs", docs, "--queries", queries,
                "--triples", triples_tsv, "--out", teacher])

    from pacednegatives_tpu.cli.distill import main as distill_main

    dsum = distill_main([
        "--docs", docs, "--queries", queries, "--triples", triples_tsv,
        "--teacher", teacher, "--model", "tiny", "--vocab_size", "300",
        "--tokenizer", tok_path, "--objective", "margin_mse",
        "--total_steps", "16", "--batch_size", "4",
        "--out_dir", str(d / "distill"),
    ])
    assert dsum["steps"] == 4
    with open(str(d / "distill" / "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(np.isfinite(l.get("loss", np.nan)) for l in lines)
