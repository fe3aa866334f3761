#!/bin/bash
# Round-5 follow-up queue: waits for the main r5 queue to drain, then
# re-runs experiments that failed in the first pass:
#   - scored64_188 (bf16 C=64): preempted twice by the driver's official
#     bench in the first tunnel window — the bf16 arm is the comparison
#     point for scored64i8_188, so the north-star table needs it.
#   - int8_fidelity: first attempt OOMed (4096 L=188 rows through t5-base
#     in one scoring call); the probe now chunks (PROBE_CHUNK=512).
#   - scored256_188 / scored256i8_188: same OOM inside the step's scoring
#     pass; train/scored_pool.py now chunks it (BENCH_SCORE_CHUNK=1024).
#   - scored128 arms: fill in the C curve for docs/north_star.md §2.
# Same record/commit contract as tpu_experiment_queue_r5.sh.
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl

wait_pidfile() { # block while the main queue is alive
  local p
  p=$(cat /tmp/queue_r5.pid 2>/dev/null)
  while [ -n "$p" ] && kill -0 "$p" 2>/dev/null; do sleep 60; done
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5b] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5b] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5b.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r5b.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-b: $name measured"
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5b] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5b.txt 2>/tmp/q_err_r5b.txt
  local out
  out=$(tail -1 /tmp/q_out_r5b.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5b] $name preempted; retrying after driver" >&2
    sleep 30
    wait_driver
    setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
      timeout "$t" python bench.py >/tmp/q_out_r5b.txt 2>/tmp/q_err_r5b.txt
  fi
  record "$name"
}

run_probe() {
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5b] $name starting at $(date -u +%H:%M:%S)" >&2
  setsid env "$@" timeout "$t" python scripts/int8_fidelity_probe.py \
    >/tmp/q_out_r5b.txt 2>/tmp/q_err_r5b.txt
  record "$name"
}

echo "[queue-r5b] waiting for main r5 queue to drain..." >&2
wait_pidfile
echo "[queue-r5b] main queue done at $(date -u +%H:%M:%S)" >&2

L188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20"

run scored64_188 1800 fused $L188 BENCH_SCORED_POOL=64
run_probe int8_fidelity 2400 $L188
run scored256_188   2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000
run scored256i8_188 2400 fused $L188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8
run scored128_188   2400 fused $L188 BENCH_SCORED_POOL=128 BENCH_POOL=1000
run scored128i8_188 2400 fused $L188 BENCH_SCORED_POOL=128 BENCH_POOL=1000 BENCH_SCORE_DTYPE=int8

echo "[queue-r5b] done at $(date -u +%H:%M:%S)" >&2
