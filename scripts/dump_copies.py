"""Compile the headline fused train step and summarize where the optimized
HLO contains copy instructions (shape -> count, with defining/using context
for the top shapes). Chases the ~11 ms/step of copy-done time in the trace
(scripts/profile_step.py). Uses compiled.as_text() because the axon-tunneled
backend compiles remotely — --xla_dump_to never lands on this host.

Usage:
  BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 \
  BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored python scripts/dump_copies.py
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from bench import build
from pacednegatives_tpu.curriculum import EtaController
from pacednegatives_tpu.train import (
    init_train_state,
    make_fused_step,
    make_optimizer,
    make_train_step,
)


def main():
    model = os.environ.get("BENCH_MODEL", "base")
    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    n = int(os.environ.get("BENCH_NEGS", "7"))

    cfg, tok, corpus, store, triples, dc, params = build(model)
    ctrl = EtaController(
        eta0=0.5, meta_lr=1e-3, warmup_steps=10, total_steps=64,
        ce_scale=2.0 * float(np.log(cfg.vocab_size)),
    )
    tx = make_optimizer(lr=1e-3, total_steps=64,
                        moments=os.environ.get("BENCH_OPT_MOMENTS", "fp32"))
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=n,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        microbatches=int(os.environ.get("BENCH_MICROBATCH", "1")),
    )
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=n)
    state = init_train_state(params, tx, ctrl.init())
    idx = jax.numpy.arange(batch_size, dtype=jax.numpy.int32)
    compiled = jax.jit(fused).lower(state, idx).compile()
    text = compiled.as_text()
    out_path = os.environ.get("HLO_OUT", "/tmp/step_optimized.hlo")
    with open(out_path, "w") as f:
        f.write(text)
    print(f"HLO: {len(text)} bytes -> {out_path}")

    lines = text.splitlines()
    # plain layout copies AND copy-start/copy-done pairs (memory-space /
    # prefetch copies); count by (kind, shape-with-layout)
    pat = re.compile(r"^\s*(?:ROOT )?(%?[\w.\-]+) = (\S+) (copy|copy-done|copy-start)\(")
    by_key = collections.Counter()
    examples = collections.defaultdict(list)
    for i, ln in enumerate(lines):
        m = pat.match(ln)
        if not m:
            continue
        key = (m.group(3), m.group(2))
        by_key[key] += 1
        if len(examples[key]) < 2:
            examples[key].append((i, ln.strip()))
    total = sum(c for (k, _), c in by_key.items())
    print(f"total copy-family instructions: {total}")
    for (kind, shape), cnt in by_key.most_common(16):
        print(f"  {cnt:5d}  {kind:10s} {shape[:120]}")
    print()
    for (kind, shape), cnt in by_key.most_common(6):
        print(f"=== {kind} {shape[:100]} (x{cnt}) ===")
        for i, ln in examples[(kind, shape)][:1]:
            print("  " + ln[:260])
            opm = re.search(r"copy(?:-start|-done)?\((%?[\w.\-]+)", ln)
            if opm:
                op = opm.group(1).lstrip("%")
                for j in range(max(0, i - 2000), i):
                    if re.match(rf"^\s*(?:ROOT )?%?{re.escape(op)} = ", lines[j]):
                        print("    def: " + lines[j].strip()[:260])
                        break
            name = ln.split(" = ")[0].strip().lstrip("%").replace("ROOT ", "")
            for j in range(i + 1, min(len(lines), i + 2000)):
                if re.search(rf"[( ]%?{re.escape(name)}[,)]", lines[j]):
                    print("    use: " + lines[j].strip()[:260])
                    break
        print()


if __name__ == "__main__":
    main()
