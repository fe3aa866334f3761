#!/bin/bash
# Round-5 queue D: chains after queue-c. The measured L=188 lever calls
# are bf16 grad-accum +3.0% and bf16 attention residual +3.0% (each vs
# base 7.468 steps/s); this queue measures their COMBINATION at both
# sequence lengths, then runs a full bench with the winning flags so the
# compile cache is warm for the flipped defaults the driver's
# end-of-round official run will use.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl

wait_pidfile() {
  local p
  p=$(cat /tmp/queue_r5c.pid 2>/dev/null)
  while [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do sleep 60; done
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5d] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5d] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5d.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r5d.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-d: $name measured"
}

run() {
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5d] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5d.txt 2>/tmp/q_err_r5d.txt
  local out
  out=$(tail -1 /tmp/q_out_r5d.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5d] $name preempted; retrying after driver" >&2
    sleep 30
    wait_driver
    setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
      timeout "$t" python bench.py >/tmp/q_out_r5d.txt 2>/tmp/q_err_r5d.txt
  fi
  record "$name"
}

run_full() {
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5d] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5d.txt 2>/tmp/q_err_r5d.txt
  local rc=$? wall=$((SECONDS - t0)) out
  out=$(tail -1 /tmp/q_out_r5d.txt 2>/dev/null)
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 200 /tmp/q_err_r5d.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-d: $name measured"
}

echo "[queue-r5d] waiting for queue-c to drain..." >&2
wait_pidfile
echo "[queue-r5d] queue-c done at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"
L512="BENCH_DOC_TOKENS=484 BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 BENCH_MICROBATCH=8 BENCH_OPT_MOMENTS=factored BENCH_STEPS=16"

run acc_res_188 1200 fused $L188 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
run acc_res_512 1800 fused $L512 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
# scored-pool with the winning train-side flags (the scoring pass is
# unchanged; the train pass inside the scored step gets the win too)
run scored64_acc_res 2400 fused $L188 BENCH_SCORED_POOL=64 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
# full bench under the winner flags: records the improved headline AND
# warms the cache for the flipped defaults
run_full full_winners 2500 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16

echo "[queue-r5d] done at $(date -u +%H:%M:%S)" >&2
