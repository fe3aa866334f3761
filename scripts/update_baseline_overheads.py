"""Measure the reference-baseline overhead increments and write
docs/baseline_overheads.json (see docs/baseline_methodology.md §2).

Runs the `ref` bench phase four times on the current backend — plain,
+worker IPC, +per-tensor optimizer loop, +both — and records steps/s for
each plus the derived ``overhead_multiple`` that bench.py folds into
``vs_reference_derived``.

Usage:  python scripts/update_baseline_overheads.py   (needs the TPU)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "plain_sps": {},
    "worker_sps": {"BENCH_BASELINE_WORKER": "1"},
    "hf_loop_sps": {"BENCH_BASELINE_OPT": "hf_loop"},
    "deep_sps": {"BENCH_BASELINE_WORKER": "1", "BENCH_BASELINE_OPT": "hf_loop"},
}


def run_ref(extra_env: dict) -> float:
    # Drop any inherited BENCH_* knobs: the output is labeled as measured at
    # bench.py DEFAULTS, and a stray BENCH_MODEL/BENCH_BATCH from a prior
    # experiment shell would silently corrupt the overhead_multiple that
    # bench.py folds into every vs_reference_derived headline.
    env = {k: v for k, v in os.environ.items() if not k.startswith("BENCH_")}
    env.update(BENCH_PHASE="ref", **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    for line in proc.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("phase") == "ref":
            return float(rec["steps_per_sec"])
    raise SystemExit(
        f"ref phase produced no record for {extra_env}:\n{proc.stderr[-1500:]}"
    )


def main():
    import jax

    import datetime

    out = {
        "device": str(jax.devices()[0]),
        "config": "t5-base B=16 n=7 L=188 (bench.py defaults)",
        "measured": (
            f"{datetime.date.today().isoformat()}, "
            "scripts/update_baseline_overheads.py procedure (values from "
            "BENCH_PHASE=ref runs; see docs/baseline_methodology.md §2)"
        ),
    }
    for key, env in CONFIGS.items():
        out[key] = round(run_ref(env), 4)
        print(f"{key}: {out[key]} steps/s", flush=True)
    out["overhead_multiple"] = round(out["plain_sps"] / out["deep_sps"], 4)
    out["notes"] = (
        "worker prefetch overlaps host batch prep with device compute; "
        "hf_loop reproduces the per-tensor legacy-AdamW optimizer loop. "
        "overhead_multiple = plain/deep; both vs_baseline and "
        "vs_reference_derived are reported in the bench record."
    )
    path = os.path.join(REPO, "docs", "baseline_overheads.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: overhead_multiple={out['overhead_multiple']}")


if __name__ == "__main__":
    main()
