#!/bin/bash
# Round-3 TPU experiment queue, part 2: bf16 attention-VJP residual
# (T5Config.attn_residual_dtype) — the third structural copy-traffic item
# from the round-3 HLO attribution (fp32 score-residual staging,
# 0.65 GB/step). Run AFTER tpu_experiment_queue.sh; combines with
# whichever of flash_v3 / bf16 grad-accum survived part 1 by passing
# extra env on the command line, e.g.:
#   BENCH_GRAD_ACCUM=bf16 scripts/tpu_experiment_queue2.sh
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "tunnel up" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"
L512="BENCH_DOC_TOKENS=484 BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 BENCH_MICROBATCH=8 BENCH_OPT_MOMENTS=factored BENCH_STEPS=16"

run() { # name, timeout_s, env...
  local name="$1" t="$2"; shift 2
  local out
  out=$(env "$@" BENCH_PHASE=fused timeout "$t" python bench.py 2>/tmp/q2_err.txt)
  if [ -n "$out" ]; then
    echo "{\"exp\": \"$name\", $(echo "$out" | tail -1 | sed 's/^{//')"
  else
    echo "{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q2_err.txt | tr '"\n' ' ')\"}"
  fi
}

run attnres188 1200 $L188 BENCH_ATTN_RES=bf16
run ffnvjp188 1200 $L188 BENCH_FFN_VJP=1
run both188 1200 $L188 BENCH_ATTN_RES=bf16 BENCH_FFN_VJP=1
run attnres512 1800 $L512 BENCH_ATTN_RES=bf16
run ffnvjp512 1800 $L512 BENCH_FFN_VJP=1
echo "queue2 done" >&2
