"""MarginMSE / CE distillation CLI (reference distill/train_t5.py and
train_baseline.py parity).

Usage:
  python -m pacednegatives_tpu.cli.distill --docs docs.tsv --queries q.tsv \\
      --triples triples.tsv --teacher teacher.json --out_dir runs/distill \\
      --objective margin_mse --total_steps 100000 --batch_size 16
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from pacednegatives_tpu.utils.config import parse_cli


def main(argv=None) -> dict:
    args = parse_cli(argv)
    out_dir = args.get("out_dir", "runs/distill")
    objective = args.get("objective", "margin_mse")
    total_steps = int(args.get("total_steps", 100_000))
    batch_size = int(args.get("batch_size", 16))
    lr = float(args.get("lr", 5e-5))
    model = args.get("model", "small")
    vocab = int(args.get("vocab_size", 8192))
    os.makedirs(out_dir, exist_ok=True)

    from pacednegatives_tpu.data import HashTokenizer, TextCorpus, TokenizedStore
    from pacednegatives_tpu.data.tokenizer import TrainedTokenizer
    from pacednegatives_tpu.distill import TeacherBatcher, TeacherScores, make_distill_step
    from pacednegatives_tpu.distill.loader import load_triples_tsv
    from pacednegatives_tpu.distill.train import init_distill_state
    from pacednegatives_tpu.models import T5Config, init_params
    from pacednegatives_tpu.train import MetricWriter, make_optimizer

    corpus = TextCorpus.from_tsv(args["docs"], args["queries"])
    tok_arg = args.get("tokenizer", "hash")
    tok = (
        TrainedTokenizer.load(tok_arg)
        if tok_arg.endswith(".json")
        else HashTokenizer(vocab_size=vocab)
    )
    store = TokenizedStore.build(corpus, tok)
    triples = load_triples_tsv(args["triples"])
    teacher = TeacherScores.load(args["teacher"])
    batcher = TeacherBatcher(triples, corpus, store, teacher, batch_size)

    import dataclasses

    mk = {"tiny": lambda: T5Config.tiny(tok.vocab_size), "small": T5Config.small,
          "base": T5Config.base}[model]
    mcfg = dataclasses.replace(
        mk(), vocab_size=max(tok.vocab_size, 16),
        dtype=jnp.bfloat16, remat=True, remat_policy="dots",
    )
    params = init_params(jax.random.key(0), mcfg)
    steps = total_steps // batch_size
    tx = make_optimizer(lr, steps)
    step = jax.jit(
        make_distill_step(mcfg, tx, objective, rel_id=tok.true_id, nrel_id=tok.false_id),
        donate_argnums=0,
    )
    state = init_distill_state(params, tx)
    writer = MetricWriter(os.path.join(out_dir, "metrics.jsonl"))

    t0 = time.time()
    for i in range(steps):
        batch = batcher.get_batch(i % max(batcher.num_batches, 1))
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if i % 50 == 0:
            writer.write({"step": i, "loss": float(m["loss"])})
    writer.write({"step": steps, "time": time.time() - t0})
    writer.close()

    from pacednegatives_tpu.train.loop import save_checkpoint
    from pacednegatives_tpu.train.state import TrainState

    save_checkpoint(
        os.path.join(out_dir, "final"),
        TrainState(state.params, state.opt_state, {}, state.step, jax.random.key(0)),
    )
    summary = {"steps": steps, "out_dir": out_dir}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
