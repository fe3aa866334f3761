#!/bin/bash
# Round-5 queue E: chains after queue-d. flash_v3 measured +18.5% at
# L=512 (2.301 -> 2.728 steps/s) while losing 9.3% at L=188 -- this queue
# measures its L=512 stacking with the two landed bf16 levers, and
# re-runs the res_ffn_188 combo the driver bench preempted.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl

wait_pidfile() {
  local p
  p=$(cat /tmp/queue_r5d.pid 2>/dev/null)
  while [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do sleep 60; done
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5e] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5e] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5e.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r5e.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-e: $name measured"
}

run() {
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5e] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5e.txt 2>/tmp/q_err_r5e.txt
  local out
  out=$(tail -1 /tmp/q_out_r5e.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5e] $name preempted; retrying after driver" >&2
    sleep 30
    wait_driver
    setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
      timeout "$t" python bench.py >/tmp/q_out_r5e.txt 2>/tmp/q_err_r5e.txt
  fi
  record "$name"
}

run_full() {
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5e] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5e.txt 2>/tmp/q_err_r5e.txt
  local rc=$? wall=$((SECONDS - t0)) out
  out=$(tail -1 /tmp/q_out_r5e.txt 2>/dev/null)
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 200 /tmp/q_err_r5e.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-e: $name measured"
}

echo "[queue-r5e] waiting for queue-d to drain..." >&2
wait_pidfile
echo "[queue-r5e] queue-d done at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"
run v3_acc_512     3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16
run v3_acc_res_512 3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16
run res_ffn_188    1200 fused $L188 BENCH_ATTN_RES=bf16 BENCH_FFN_VJP=1

echo "[queue-r5e] done at $(date -u +%H:%M:%S)" >&2
