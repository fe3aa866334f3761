#!/bin/bash
# Round-3 TPU experiment queue: waits for the axon tunnel, then runs the
# full-step A/B series for the two new perf levers (flash v3 fused
# projection+attention kernel; bf16 grad-accum carry), at L=188 first
# (headline config) and L=512 for survivors. One JSON line per experiment
# on stdout; each phase runs in its own process via BENCH_PHASE (donated
# buffers / fragmentation can't cross-contaminate).
#
# Go/no-go thresholds (docs/flash_v3_design.md): L=188 fused >= 7.9 steps/s
# (60% MFU) for flash_v3 to default on; L=512 >= 2.53 (55% MFU).
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
  out=$(env "$@" BENCH_PHASE=fused timeout "$t" python bench.py 2>/tmp/q_err.txt)
  if [ -n "$out" ]; then
    echo "{\"exp\": \"$name\", $(echo "$out" | tail -1 | sed 's/^{//')"
  else
    echo "{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err.txt | tr '"\n' ' ')\"}"
  fi
}

# 1. current-best baseline re-confirm (cache-warm from round 3)
run base188 1200 $L188
# 2. flash v3 (fused qkv hoist on, as designed)
run v3_188 2400 $L188 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1
# 3. bf16 grad-accum carry alone
run bf16acc188 1200 $L188 BENCH_GRAD_ACCUM=bf16
# 4. both levers
run v3_bf16_188 1800 $L188 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16
# 5. L=512 baseline + levers (long compiles: generous timeouts)
run base512 1800 $L512
run v3_512 3000 $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1
run bf16acc512 1800 $L512 BENCH_GRAD_ACCUM=bf16
echo "queue done" >&2
