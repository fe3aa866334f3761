"""End-to-end smoke of scripts/msmarco_parity.py on a fabricated mount.

The real run needs a t5-base checkpoint + MS MARCO (no network here); this
test fabricates the exact inputs the script checks for — a tiny local HF T5
checkpoint (saved with save_pretrained, loaded back through
models/hf_import.load_hf_checkpoint), a TrainedTokenizer, and a synthetic
TSV corpus — and drives all three stages (pools -> train -> eval) plus the
missing-input and resume paths. This is the proof the recipe is runnable,
not just documented (reference workflow: train/train_lce.py + eval.py).
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from msmarco_parity import main as parity_main


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _fabricate(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()

    n_docs, n_q = 40, 8
    doc_texts = {}
    with open(data / "docs.tsv", "w") as f:
        for d in range(n_docs):
            text = " ".join(rng.choice(WORDS, size=12))
            doc_texts[f"d{d}"] = text
            f.write(f"d{d}\t{text}\n")
    # each query shares words with its positive doc
    with open(data / "queries.tsv", "w") as fq, \
         open(data / "pairs.tsv", "w") as fp:
        for q in range(n_q):
            pos = f"d{q}"
            fq.write(f"q{q}\t{' '.join(doc_texts[pos].split()[:3])}\n")
            fp.write(f"q{q}\t{pos}\n")
    with open(data / "eval_queries.tsv", "w") as f:
        for q in range(4):
            f.write(f"q{q}\t{' '.join(doc_texts[f'd{q}'].split()[:3])}\n")
    with open(data / "qrels.tsv", "w") as f:
        for q in range(4):
            f.write(f"q{q}\td{q}\t1\n")

    # tiny local HF checkpoint (what a mounted t5-base looks like)
    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=1,
        num_decoder_layers=1, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    ckpt = tmp_path / "ckpt"
    model.save_pretrained(ckpt)

    # in-repo tokenizer standing in for the checkpoint's spiece vocab
    from pacednegatives_tpu.data.tokenizer import TrainedTokenizer

    tok = TrainedTokenizer.train(doc_texts.values(), vocab_size=256)
    tok_path = tmp_path / "tok.json"
    tok.save(str(tok_path))
    return data, ckpt, tok_path


def test_missing_inputs_reports_and_skips(tmp_path):
    rep = parity_main([
        "--checkpoint", str(tmp_path / "nope"),
        "--data_dir", str(tmp_path / "nodata"),
        "--out", str(tmp_path / "out"),
    ])
    assert rep["ran"] is False
    assert len(rep["missing"]) == 6


def test_full_pipeline_on_fabricated_mount(tmp_path):
    data, ckpt, tok_path = _fabricate(tmp_path)
    out = tmp_path / "out"
    rep = parity_main([
        "--checkpoint", str(ckpt),
        "--data_dir", str(data),
        "--tokenizer", str(tok_path),
        "--out", str(out),
        "--cutoff", "10",
        "--total_steps", "32",
        "--batch_size", "4",
        "--warmup_steps", "4",
        "--n", "2",
    ])
    assert rep["ran"] is True
    # all three stage outputs exist
    assert (out / "pools.jsonl").exists()
    assert (out / "run_lce" / "final").exists()
    assert (out / "eval" / "results.csv").exists()
    report = json.loads((out / "parity_report.json").read_text())
    row = report["results"][0]
    for metric in ("map", "ndcg_cut_10", "recip_rank"):
        assert metric in row and 0.0 <= row[metric] <= 1.0

    # resumability: a second invocation skips pools/train (mtime unchanged)
    m0 = os.path.getmtime(out / "pools.jsonl")
    rep2 = parity_main([
        "--checkpoint", str(ckpt), "--data_dir", str(data),
        "--tokenizer", str(tok_path), "--out", str(out),
    ])
    assert rep2["ran"] is True
    assert os.path.getmtime(out / "pools.jsonl") == m0
