#!/bin/bash
# Round-5 TPU experiment queue — HEADLINE FIRST (VERDICT r4 item 1): the
# round's one non-negotiable is a driver-format perf record, so the first
# thing that runs when the tunnel returns is a BENCH_FAST full bench
# (fused + reference-style only, warm cache, ~3 min device time) whose
# record carries value / vs_baseline / mfu / north_star. Everything else
# is ordered by marginal value:
#   0. fast headline (official-format record, ~3 min)
#   1. north-star arms: scored-pool C=64 and C=256, bf16 + int8 scoring,
#      plus the int8 rank-fidelity probe at the real config
#   2. base188 reconfirm + the four round-3 structural levers + combos
#   3. rerank serving arms (bf16 / int8 / packed / packed+int8)
#   4. L=512 variants
#   5. TWO full default benches (cache re-warm + warm wall time) so the
#      driver's end-of-round run hits a hot cache
#
# EVERY completed experiment is committed to the repo tree immediately
# (docs/experiments_r5.jsonl): a tunnel that dies mid-queue — or a round
# that closes with no live session — still lands its evidence in git.
#
# CHIP ARBITRATION (bench.py:_DRIVER_LOCK/_QUEUE_ACTIVE): the driver's
# official bench takes /tmp/pn_bench_driver.lock and preempts the live
# experiment; this queue waits while that lock is held by a live pid and
# retries a preempted experiment once. BENCH_QUEUE=1 makes each
# experiment's bench.py process advertise its pid in
# /tmp/pn_queue_active.pid so the driver can preempt exactly it.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5] driver bench active (pid $dp); waiting" >&2
      sleep 30
    else
      rm -f /tmp/pn_bench_driver.lock
      break
    fi
  done
}

commit_results() { # msg — commit ONLY the results file; retry on index.lock
  local msg="$1" i
  for i in 1 2 3 4 5; do
    if git add "$RESULTS" 2>/dev/null \
       && git commit -q -m "$msg" -- "$RESULTS" 2>/dev/null; then
      return 0
    fi
    sleep $((RANDOM % 5 + 2))
  done
  echo "[queue-r5] WARNING: commit failed for: $msg" >&2
}

record() { # name — reads /tmp/q_out_r5.txt / q_err_r5.txt, appends + commits
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r5.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue: $name measured"
}

run_once() { # timeout_s, phase, env...
  # setsid: own process group per experiment so driver preemption
  # (bench.py killpg) can never take this queue script down with it.
  local t="$1" phase="$2"; shift 2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5.txt 2>/tmp/q_err_r5.txt
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5] $name starting at $(date -u +%H:%M:%S)" >&2
  run_once "$t" "$phase" "$@"
  local out
  out=$(tail -1 /tmp/q_out_r5.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    run_once "$t" "$phase" "$@"
  fi
  record "$name"
}

run_full() { # name, timeout_s, env... — full bench (no BENCH_PHASE),
  local name="$1" t="$2"; shift 2  # queue-mode parent: preemptible, no lock
  wait_driver
  echo "[queue-r5] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5.txt 2>/tmp/q_err_r5.txt
  local rc=$? wall=$((SECONDS - t0)) out
  out=$(tail -1 /tmp/q_out_r5.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    t0=$SECONDS
    setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
      >/tmp/q_out_r5.txt 2>/tmp/q_err_r5.txt
    rc=$?; wall=$((SECONDS - t0))
    out=$(tail -1 /tmp/q_out_r5.txt 2>/dev/null)
  fi
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 200 /tmp/q_err_r5.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue: $name measured"
}

run_probe() { # name, timeout_s, env... — int8 rank-fidelity probe
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" timeout "$t" python scripts/int8_fidelity_probe.py \
    >/tmp/q_out_r5.txt 2>/tmp/q_err_r5.txt
  record "$name"
}

echo "r5: waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "r5: tunnel up at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"
L512="BENCH_DOC_TOKENS=484 BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 BENCH_MICROBATCH=8 BENCH_OPT_MOMENTS=factored BENCH_STEPS=16"

# --- 0. headline record, before anything else can burn the tunnel window
run_full fast_headline 1500 BENCH_FAST=1

# --- 1. north-star arms (docs/north_star.md §2)
run scored64_188    1800 fused $L188 BENCH_SCORED_POOL=64
run scored64i8_188  2400 fused $L188 BENCH_SCORED_POOL=64 BENCH_SCORE_DTYPE=int8
run_probe int8_fidelity 2400 $L188
run scored256_188   2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000
run scored256i8_188 2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8

# --- 2. base reconfirm + the four round-3 levers + combos at L=188
run base188     1200 fused $L188
run v3_188      2400 fused $L188 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1
run bf16acc188  1200 fused $L188 BENCH_GRAD_ACCUM=bf16
run attnres188  1200 fused $L188 BENCH_ATTN_RES=bf16
run ffnvjp188   1200 fused $L188 BENCH_FFN_VJP=1
run v3_bf16_188 1800 fused $L188 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16
run res_ffn_188 1200 fused $L188 BENCH_ATTN_RES=bf16 BENCH_FFN_VJP=1

# --- 3. rerank serving arms (eval/rerank.py; reference pads everything)
run rerank_bf16        900  rerank BENCH_STEPS=40
run rerank_int8        1500 rerank BENCH_STEPS=40 BENCH_RERANK_INT8=1
run rerank_packed      2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1
run rerank_packed_int8 2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1 BENCH_RERANK_INT8=1

# --- 4. L=512 (long compiles: generous timeouts)
run base512    1800 fused $L512
run v3_512     3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1
run bf16acc512 1800 fused $L512 BENCH_GRAD_ACCUM=bf16
run attnres512 1800 fused $L512 BENCH_ATTN_RES=bf16
run ffnvjp512  1800 fused $L512 BENCH_FFN_VJP=1

# --- 5. round-close validation: re-warm .jax_cache + record the warm wall
# time the driver's end-of-round run will see
run_full warm_full_1 2500
run_full warm_full_2 2500

echo "r5 queue done at $(date -u +%H:%M:%S)" >&2
