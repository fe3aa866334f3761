#!/bin/bash
# Round-5 consolidated retry queue. The overnight r5 queue banked the
# headline (fast_headline rc=0: 836 neg/s/chip, 2.93x, 56.9% MFU) and the
# single-lever A/Bs, but a machine restart at 09:32Z killed queues b-e
# before any of their arms ran, and four arms of the main queue failed
# (scored64 bf16 + scored256 pair: un-chunked scoring pass OOM, since
# fixed; fidelity probe: un-chunked scoring OOM, since fixed + candidate
# mixture rework). This queue re-runs EVERYTHING still pending, ordered
# by marginal value so an early tunnel loss still lands the north-star
# chain:
#   1. scored-pool bf16/int8 at C=64/256 (the 10x arms) + fidelity probe
#   2. bf16-stream int8 scoring arms
#   3. winner-combo levers at L=188 + the full-bench winner validation
#   4. C=128 curve points, L=512 combos
#   5. warm full benches (driver round-close cache warm-up)
# Fixes vs the dead queues: queue-e referenced $L512 without defining it
# (set -u would have killed it at v3_acc_512); everything here defines
# both. Per-experiment commits as before.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl
echo $$ > /tmp/queue_r5f.pid

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5f] driver bench active (pid $dp); waiting" >&2
      sleep 30
    else
      rm -f /tmp/pn_bench_driver.lock
      break
    fi
  done
}

commit_results() {
  local msg="$1" i
  for i in 1 2 3 4 5; do
    if git add "$RESULTS" 2>/dev/null \
       && git commit -q -m "$msg" -- "$RESULTS" 2>/dev/null; then
      return 0
    fi
    sleep $((RANDOM % 5 + 2))
  done
  echo "[queue-r5f] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5f.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 300 /tmp/q_err_r5f.txt | tr '\"\n' ' ')\"}"
    cp /tmp/q_err_r5f.txt "/tmp/q_err_r5f_${name}.txt" 2>/dev/null
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-f: $name measured"
}

run_once() {
  local t="$1" phase="$2"; shift 2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5f.txt 2>/tmp/q_err_r5f.txt
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5f] $name starting at $(date -u +%H:%M:%S)" >&2
  run_once "$t" "$phase" "$@"
  local out
  out=$(tail -1 /tmp/q_out_r5f.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5f] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    run_once "$t" "$phase" "$@"
  fi
  record "$name"
}

run_full() { # name, timeout_s, env...
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5f] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5f.txt 2>/tmp/q_err_r5f.txt
  local rc=$? wall=$((SECONDS - t0)) out
  out=$(tail -1 /tmp/q_out_r5f.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5f] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    t0=$SECONDS
    setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
      >/tmp/q_out_r5f.txt 2>/tmp/q_err_r5f.txt
    rc=$?; wall=$((SECONDS - t0))
    out=$(tail -1 /tmp/q_out_r5f.txt 2>/dev/null)
  fi
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 300 /tmp/q_err_r5f.txt | tr '\"\n' ' ')\"}"
    cp /tmp/q_err_r5f.txt "/tmp/q_err_r5f_${name}.txt" 2>/dev/null
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-f: $name measured"
}

run_probe() {
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5f] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" timeout "$t" python scripts/int8_fidelity_probe.py \
    >/tmp/q_out_r5f.txt 2>/tmp/q_err_r5f.txt
  record "$name"
}

echo "[queue-r5f] waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "[queue-r5f] tunnel up at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"
L512="BENCH_DOC_TOKENS=484 BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 BENCH_MICROBATCH=8 BENCH_OPT_MOMENTS=factored BENCH_STEPS=16"

# --- 1. north-star chain (docs/north_star.md §2)
run scored64_188    2400 fused $L188 BENCH_SCORED_POOL=64
run scored256_188   2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000
run scored256i8_188 2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8
run_probe int8_fidelity_v2 2400 $L188

# --- 2. bf16-stream int8 scoring arms
run scored64i8b_188  2400 fused $L188 BENCH_SCORED_POOL=64 BENCH_SCORE_DTYPE=int8_bf16
run scored256i8b_188 2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8_bf16

# --- 3. winner combos at L=188 + full-bench winner validation
run acc_res_188 1200 fused $L188 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
run res_ffn_188 1200 fused $L188 BENCH_ATTN_RES=bf16 BENCH_FFN_VJP=1
run_full full_winners 2500 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16

# --- 4. curve points + L=512 combos
run scored128_188   2400 fused $L188 BENCH_SCORED_POOL=128 BENCH_POOL=1000
run scored128i8_188 2400 fused $L188 BENCH_SCORED_POOL=128 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8
run scored64_acc_res 2400 fused $L188 BENCH_SCORED_POOL=64 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
run v3_acc_512     3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16
run v3_acc_res_512 3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
run acc_res_512    1800 fused $L512 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16

# --- 5. round-close cache warm-up for the driver's official run
run_full warm_full_1 2500
run_full warm_full_2 2500

echo "[queue-r5f] done at $(date -u +%H:%M:%S)" >&2
