"""CLI/runner smoke tests: every curriculum through the public entry points
on tiny synthetic configs, sweeps, pool building, config parsing."""

import json
import os

import numpy as np
import pytest

from pacednegatives_tpu.train.runner import RunConfig, load_run, run
from pacednegatives_tpu.utils.config import apply_overrides, parse_cli


TINY = dict(
    model="tiny", bf16=False, remat=False, vocab_size=512,
    synthetic_docs=32, synthetic_queries=8, synthetic_pairs=32,
    synthetic_pool=8, max_q_tokens=6, max_d_tokens=16,
    total_steps=24, warmup_steps=4, batch_size=4, chunk_size=3,
)


def test_parse_cli_forms():
    got = parse_cli(["--a", "1", "--b=x", "--some-flag", "true"])
    assert got == {"a": "1", "b": "x", "some_flag": "true"}
    with pytest.raises(SystemExit):
        parse_cli(["positional"])
    with pytest.raises(SystemExit):
        parse_cli(["--dangling"])


def test_apply_overrides_coercion():
    cfg = RunConfig()
    got = apply_overrides(
        cfg, {"total_steps": "100", "lr": "0.5", "shuffle": "true",
              "meta_lr": "none", "model": "base"}
    )
    assert got.total_steps == 100 and got.lr == 0.5
    assert got.shuffle is True and got.meta_lr is None and got.model == "base"
    with pytest.raises(SystemExit):
        apply_overrides(cfg, {"not_a_field": "1"})


@pytest.mark.parametrize("curriculum", ["interp", "level", "eta", "lce", "meta-cheap"])
def test_runner_all_curricula(tmp_path, curriculum):
    cfg = RunConfig(
        curriculum=curriculum, out_dir=str(tmp_path / curriculum),
        eta0=8.0, eta_max=10.0, n=2, **TINY,
    )
    summary = run(cfg)
    assert summary["steps"] == 24 // 4
    assert os.path.exists(os.path.join(cfg.out_dir, "final"))
    assert os.path.exists(os.path.join(cfg.out_dir, "metrics.jsonl"))
    with open(os.path.join(cfg.out_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any("loss" in l for l in lines)
    if summary["final_loss"] is not None:
        assert np.isfinite(summary["final_loss"])


def test_eval_during_training(tmp_path):
    cfg = RunConfig(
        curriculum="interp", out_dir=str(tmp_path / "e"),
        eval_every_steps=3, eval_pairs=8, **TINY,
    )
    run(cfg)
    with open(os.path.join(cfg.out_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    ev = [l for l in lines if "eval/mrr_hard" in l]
    assert len(ev) >= 2
    assert all(0.0 < l["eval/mrr_hard"] <= 1.0 for l in ev)


def test_load_run_restores_params(tmp_path):
    cfg = RunConfig(curriculum="interp", out_dir=str(tmp_path / "r"), **TINY)
    run(cfg)
    params, mcfg, tok, rc = load_run(cfg.out_dir)
    assert rc.curriculum == "interp"
    assert mcfg.vocab_size >= 512
    leaves = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params)]
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_sweep_runs_product(tmp_path):
    from pacednegatives_tpu.cli.sweep import main

    grid = {"curriculum": ["interp"], "lr": [1e-3, 5e-4]}
    gpath = str(tmp_path / "grid.json")
    with open(gpath, "w") as f:
        json.dump(grid, f)
    argv = ["--grid_file", gpath, "--out_dir", str(tmp_path / "sweep")]
    for k, v in TINY.items():
        argv += [f"--{k}", str(v)]
    results = main(argv)
    assert len(results) == 2
    assert all("error" not in r for r in results)
    assert os.path.exists(str(tmp_path / "sweep" / "sweep.json"))


def test_build_pools_cli(tmp_path):
    from pacednegatives_tpu.cli.build_pools import main
    from pacednegatives_tpu.data import TextCorpus, load_triples

    corpus = TextCorpus.synthetic(num_docs=64, num_queries=6, seed=0)
    docs = str(tmp_path / "docs.tsv")
    queries = str(tmp_path / "queries.tsv")
    with open(docs, "w") as f:
        for i, t in zip(corpus.doc_ids, corpus.doc_texts):
            f.write(f"{i}\t{t}\n")
    with open(queries, "w") as f:
        for i, t in zip(corpus.query_ids, corpus.query_texts):
            f.write(f"{i}\t{t}\n")
    out = str(tmp_path / "pools.jsonl")
    main(["--docs", docs, "--queries", queries, "--out", out, "--cutoff", "8"])
    recs = load_triples(out)
    assert len(recs) > 0
    assert all(len(r["doc_id_b"]) == 8 for r in recs)


def test_build_pools_dense_method(tmp_path):
    """compute_all_splade-analogue: dense pools from a trained run's encoder."""
    from pacednegatives_tpu.cli.build_pools import main
    from pacednegatives_tpu.data import TextCorpus, load_triples

    cfg = RunConfig(curriculum="interp", out_dir=str(tmp_path / "run"), **TINY)
    run(cfg)
    corpus = TextCorpus.synthetic(num_docs=32, num_queries=8, seed=42)
    docs, queries = str(tmp_path / "docs.tsv"), str(tmp_path / "queries.tsv")
    with open(docs, "w") as f:
        for i, t in zip(corpus.doc_ids, corpus.doc_texts):
            f.write(f"{i}\t{t}\n")
    with open(queries, "w") as f:
        for i, t in zip(corpus.query_ids, corpus.query_texts):
            f.write(f"{i}\t{t}\n")
    out = str(tmp_path / "pools.jsonl")
    main(["--docs", docs, "--queries", queries, "--out", out,
          "--cutoff", "8", "--method", "dense", "--run", str(tmp_path / "run")])
    recs = load_triples(out)
    assert len(recs) == 8
    assert all(len(r["doc_id_b"]) == 8 for r in recs)


def test_train_cli_main(tmp_path):
    from pacednegatives_tpu.cli.train import main

    argv = ["--out_dir", str(tmp_path / "cli_run"), "--curriculum", "interp"]
    for k, v in TINY.items():
        argv += [f"--{k}", str(v)]
    summary = main(argv=argv)
    assert summary["steps"] == 6


def test_runner_flat_tokens_label_grouping(tmp_path):
    """--label_grouping flat_tokens (the reference-verbatim nce.view(-1, n)
    regrouping) must thread from RunConfig through make_train_step and run
    end-to-end; it is only meaningful for the LCE curriculum."""
    cfg = RunConfig(
        curriculum="lce", out_dir=str(tmp_path / "flat"),
        eta0=8.0, eta_max=10.0, n=2, label_grouping="flat_tokens", **TINY,
    )
    summary = run(cfg)
    assert summary["steps"] == 24 // 4
    if summary["final_loss"] is not None:
        assert np.isfinite(summary["final_loss"])
