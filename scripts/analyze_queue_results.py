"""Summarize round-4 TPU experiment-queue results and recommend dispositions.

Reads the queue output JSONL files (one record per experiment, as written by
scripts/tpu_experiment_queue_r4*.sh) and prints a per-experiment table with
deltas vs the matching baseline arm, plus a LAND / REJECT / INVESTIGATE
recommendation per lever using the repo's established thresholds:

- perf levers (flash_v3, bf16 accum carry, bf16 attn residual, FFN VJP):
  LAND if the full-step steps/s delta vs the same-L baseline is >= +1%
  (the smallest delta ever landed here is factored Adam's ~+2%; anything
  under 1% is noise at 20-step timing granularity) — flash_v3 additionally
  requires flash_v3_pallas_calls >= 1 (a silent XLA fallback measured as
  "no win" must read INVESTIGATE, not REJECT).
- north-star arms (scored-pool / int8 / packed rerank): informational —
  they change the measured quantity, so the output is the number itself,
  not a land/reject call.

Usage: python scripts/analyze_queue_results.py [jsonl ...]
Defaults to /tmp/queue_r4.jsonl /tmp/queue_r4b.jsonl.
"""

from __future__ import annotations

import json
import sys

LEVERS_188 = {
    "v3_188": "flash_v3 fused-block kernel (ops/flash_v3.py)",
    "bf16acc188": "bf16 grad-accum carry (train/step.py)",
    "attnres188": "bf16 attention-VJP residual (ops/flash.py)",
    "ffnvjp188": "custom ReLU-FFN VJP (models/t5.py)",
    "v3_bf16_188": "flash_v3 + bf16 accum combo",
    "res_ffn_188": "bf16 residual + FFN VJP combo",
}
LEVERS_512 = {
    "v3_512": "flash_v3 @ L=512",
    "bf16acc512": "bf16 grad-accum carry @ L=512",
    "attnres512": "bf16 attention-VJP residual @ L=512",
    "ffnvjp512": "custom ReLU-FFN VJP @ L=512",
}
BASE = {"base188": LEVERS_188, "base512": LEVERS_512}
LAND_THRESHOLD = 1.01  # >= +1% full-step steps/s


def load(paths):
    recs = {}
    for p in paths:
        try:
            lines = open(p).read().splitlines()
        except OSError:
            continue
        for ln in lines:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "exp" in rec:
                recs[rec["exp"]] = rec  # later rerun of an arm wins
    return recs


def main(paths):
    recs = load(paths)
    if not recs:
        print("no experiment records found in:", " ".join(paths))
        return 1

    out = {"dispositions": {}, "info": {}}
    for base_name, levers in BASE.items():
        base = recs.get(base_name)
        base_sps = base.get("steps_per_sec") if base else None
        if base_sps:
            print(f"\n== {base_name}: {base_sps:.3f} steps/s ==")
        else:
            print(f"\n== {base_name}: MISSING — lever deltas below are "
                  f"against round-3 prose numbers, re-run the queue ==")
        for exp, desc in levers.items():
            rec = recs.get(exp)
            if rec is None:
                print(f"  {exp:>14}: (not run)")
                continue
            if "failed" in rec:
                print(f"  {exp:>14}: FAILED — {rec['failed'][:120]}")
                out["dispositions"][exp] = "INVESTIGATE (run failed)"
                continue
            sps = rec.get("steps_per_sec")
            if sps is None:
                print(f"  {exp:>14}: no steps_per_sec in record")
                out["dispositions"][exp] = "INVESTIGATE (bad record)"
                continue
            note = ""
            if exp.startswith("v3_"):
                calls = rec.get("flash_v3_pallas_calls")
                if not calls:
                    note = " [kernel DID NOT engage]"
                    verdict = "INVESTIGATE (silent fallback)"
                    print(f"  {exp:>14}: {sps:.3f} steps/s{note}")
                    out["dispositions"][exp] = verdict
                    continue
                note = f" [pallas_calls={calls}]"
            if base_sps:
                ratio = sps / base_sps
                verdict = ("LAND" if ratio >= LAND_THRESHOLD
                           else "REJECT" if ratio <= 2 - LAND_THRESHOLD
                           else "NEUTRAL (within noise)")
                print(f"  {exp:>14}: {sps:.3f} steps/s  "
                      f"({(ratio - 1) * 100:+.1f}%)  -> {verdict}{note}")
                out["dispositions"][exp] = verdict
            else:
                print(f"  {exp:>14}: {sps:.3f} steps/s (no baseline){note}")

    print("\n== north-star / serving arms ==")
    for exp in ("fast_headline", "scored64_188", "scored64i8_188",
                "scored256_188", "scored256i8_188", "int8_fidelity",
                "rerank_bf16", "rerank_int8", "rerank_packed",
                "rerank_packed_int8", "warm_full_1", "warm_full_2"):
        rec = recs.get(exp)
        if rec is None:
            print(f"  {exp:>18}: (not run)")
            continue
        if "failed" in rec:
            print(f"  {exp:>18}: FAILED — {rec['failed'][:120]}")
            continue
        keys = {k: v for k, v in rec.items()
                if k in ("steps_per_sec", "neg_scored_per_step",
                         "docs_per_sec", "prompt_len", "packed",
                         "int8", "bucket_lens", "scored_pool_candidates",
                         "value", "vs_baseline", "vs_reference_derived",
                         "mfu", "rc", "wall_s", "spearman_mean",
                         "spearman_min", "top8_overlap", "top32_overlap",
                         "pair_flip_rate", "mean_true_len")}
        print(f"  {exp:>18}: {json.dumps(keys)}")
        out["info"][exp] = keys

    # machine-readable tail line for scripting
    print("\n" + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["docs/experiments_r5.jsonl",
                                   "docs/experiments_r4.jsonl"]))
