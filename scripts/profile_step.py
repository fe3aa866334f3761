"""Capture a TPU trace of the fused train step and print the op-time
breakdown by HLO category and source line.

Usage (env knobs shared with bench.py):
  BENCH_DOC_TOKENS=484 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 \
  BENCH_MICROBATCH=8 BENCH_REMAT=0 python scripts/profile_step.py

The breakdown distinguishes time ON the MXU (convolution fusion) from
elementwise/copy/overhead time — the honest denominator for deciding what
to optimize next (bench.py's MFU can't tell you WHERE the non-matmul time
goes).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from bench import build
    from pacednegatives_tpu.curriculum import EtaController
    from pacednegatives_tpu.train import (
        init_train_state,
        make_fused_step,
        make_optimizer,
        make_train_step,
    )

    model = os.environ.get("BENCH_MODEL", "base")
    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    n = int(os.environ.get("BENCH_NEGS", "7"))
    steps = int(os.environ.get("PROFILE_STEPS", "4"))
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/pntpu_trace")

    cfg, tok, corpus, store, triples, dc, params = build(model)
    ctrl = EtaController(
        eta0=0.5, meta_lr=1e-3, warmup_steps=10, total_steps=steps * 4,
        ce_scale=2.0 * float(np.log(cfg.vocab_size)),
    )
    tx = make_optimizer(lr=1e-3, total_steps=steps * 4,
                        moments=os.environ.get("BENCH_OPT_MOMENTS", "fp32"))
    step = make_train_step(
        cfg, ctrl, tx, loss="lce", n_neg_per_example=n,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        microbatches=int(os.environ.get("BENCH_MICROBATCH", "1")),
    )
    fused = make_fused_step(dc, step, ctrl, loss="lce", n_neg_per_example=n)
    state = init_train_state(params, tx, ctrl.init())
    chunk = jax.jit(
        lambda s, i, c: jax.lax.scan(lambda ss, ii: fused(ss, ii, c), s, i),
        donate_argnums=0,
    )
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.integers(0, dc.num_pairs, size=(steps, batch_size)).astype(np.int32)
    )
    state, m = chunk(state, mk(), dc)
    float(np.asarray(m["loss"])[-1])  # fetch-sync (compile done)

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        state, m = chunk(state, mk(), dc)
        float(np.asarray(m["loss"])[-1])

    tj = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not tj:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(tj[0]) as f:
        data = json.load(f)

    cat = collections.Counter()
    src = collections.Counter()
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("tid") != 3:
            continue
        a = e.get("args", {})
        c = a.get("hlo_category")
        if c is None or c in ("while", "conditional", "call"):
            continue
        d = e["dur"]
        cat[c] += d
        total += d
        src[(c, a.get("source", "?"))] += d

    print(f"device leaf time: {total / 1e3:.1f} ms over {steps} steps "
          f"-> {total / steps / 1e3:.1f} ms/step")
    for c, d in cat.most_common(12):
        print(f"{d / 1e3:9.2f} ms {100 * d / total:5.1f}%  {c}")
    print("\ntop sources:")
    for (c, s), d in src.most_common(20):
        print(f"{d / 1e3:8.2f} ms {100 * d / total:5.1f}%  [{c[:18]:18s}] {s}")

    # per-op-NAME attribution for the categories the source table can't
    # explain (copies have no source line) — match names against the
    # optimized HLO text (scripts/dump_copies.py) to recover shapes
    if os.environ.get("PROFILE_OPS"):
        want = set(os.environ["PROFILE_OPS"].split(","))
        by_name = collections.Counter()
        n_exec = collections.Counter()
        for e in data["traceEvents"]:
            if e.get("ph") != "X" or e.get("tid") != 3:
                continue
            a = e.get("args", {})
            if a.get("hlo_category") in want:
                by_name[e.get("name", "?")] += e["dur"]
                n_exec[e.get("name", "?")] += 1
        print(f"\ntop ops in {want}:")
        hlo_lines = {}
        hlo_path = os.environ.get("HLO_TEXT", "/tmp/step_optimized.hlo")
        if os.path.exists(hlo_path):
            import re

            pat = re.compile(r"^\s*(?:ROOT )?%([\w.\-]+) = (\S+) ")
            for ln in open(hlo_path):
                m = pat.match(ln)
                if m:
                    hlo_lines.setdefault(m.group(1), m.group(2))
        for nm, d in by_name.most_common(25):
            shape = hlo_lines.get(nm, "")[:80]
            print(f"{d / 1e3:8.2f} ms x{n_exec[nm]:4d}  {nm:28s} {shape}")


if __name__ == "__main__":
    main()
