#!/bin/bash
# Round-5 queue C: chains after queue-b. Measures the int8_bf16 scoring
# variant (bf16 residual stream — the int8 forward's activations at fp32
# double its HBM traffic; this halves it back) at C=64 and C=256, the
# missing point of the int8 story if plain int8 underdelivers vs bf16.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl

wait_pidfile() {
  local p
  p=$(cat /tmp/queue_r5b.pid 2>/dev/null)
  while [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do sleep 60; done
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5c] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5c] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5c.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r5c.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-c: $name measured"
}

run() {
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5c] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5c.txt 2>/tmp/q_err_r5c.txt
  local out
  out=$(tail -1 /tmp/q_out_r5c.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5c] $name preempted; retrying after driver" >&2
    sleep 30
    wait_driver
    setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
      timeout "$t" python bench.py >/tmp/q_out_r5c.txt 2>/tmp/q_err_r5c.txt
  fi
  record "$name"
}

echo "[queue-r5c] waiting for queue-b to drain..." >&2
wait_pidfile
echo "[queue-r5c] queue-b done at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"

run scored64i8b_188  2400 fused $L188 BENCH_SCORED_POOL=64 BENCH_SCORE_DTYPE=int8_bf16
run scored256i8b_188 2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8_bf16

echo "[queue-r5c] done at $(date -u +%H:%M:%S)" >&2
