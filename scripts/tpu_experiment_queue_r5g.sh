#!/bin/bash
# Round-5 queue G: the length-bucketed scored-pool arms — the remaining
# north-star lever. Measured so far (docs/experiments_r5.jsonl): best
# scored-pool multiple is bf16 C=256 at ~7.3x (2082 neg scored/s vs the
# 285 neg/s reference-style baseline); int8 is slower on this platform at
# every config (rejected). The scoring pass pads every candidate row to
# the 188-token budget while true MS-MARCO-like prompt lengths average
# ~70 — the reference burns that padding too (lceT5.py:40-53 pads to
# max_length), so skipping it is a structural win the reference cannot
# take. train/scored_pool.py score_buckets sorts the scoring rows by true
# length and runs each chunk at the smallest static width covering it
# (exact scores — pinned by tests/test_scored_pool.py).
#
# Arms, by marginal value:
#   1. scored256_bkt_188    — the 10x attempt (winners + buckets, C=256)
#   2. scored256_ln_188     — control: same corpus/packing, NO buckets
#                             (separates the bucket win from the corpus)
#   3. ref_varlen           — reference-style baseline on the variable-
#                             length corpus (it pads, so expect ~no change)
#   4. scored64_bkt_188     — flagship-C bucketed point
#   5. scored256_bkt_c512   — chunk-granularity A/B (512 vs 256 rows)
#   6. v3_acc_512 / scored64_acc_res — retries of queue-f arms lost to
#      driver-bench preemption (11:37-11:41 UTC failures)
#   7. warm_full x2         — round-close cache warm-up for the driver's
#                             official run, on the NEW flipped defaults
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl
echo $$ > /tmp/queue_r5g.pid

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5g] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5g] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" out line
  out=$(tail -1 /tmp/q_out_r5g.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 300 /tmp/q_err_r5g.txt | tr '\"\n' ' ')\"}"
    cp /tmp/q_err_r5g.txt "/tmp/q_err_r5g_${name}.txt" 2>/dev/null
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-g: $name measured"
}

run_once() {
  local t="$1" phase="$2"; shift 2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5g.txt 2>/tmp/q_err_r5g.txt
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5g] $name starting at $(date -u +%H:%M:%S)" >&2
  run_once "$t" "$phase" "$@"
  local out
  out=$(tail -1 /tmp/q_out_r5g.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5g] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    run_once "$t" "$phase" "$@"
  fi
  record "$name"
}

run_full() { # name, timeout_s, env...
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5g] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5g.txt 2>/tmp/q_err_r5g.txt
  local rc=$? wall=$((SECONDS - t0)) out
  out=$(tail -1 /tmp/q_out_r5g.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r5g] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    t0=$SECONDS
    setsid env "$@" BENCH_QUEUE=1 timeout "$t" python bench.py \
      >/tmp/q_out_r5g.txt 2>/tmp/q_err_r5g.txt
    rc=$?; wall=$((SECONDS - t0))
    out=$(tail -1 /tmp/q_out_r5g.txt 2>/dev/null)
  fi
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 300 /tmp/q_err_r5g.txt | tr '\"\n' ' ')\"}"
    cp /tmp/q_err_r5g.txt "/tmp/q_err_r5g_${name}.txt" 2>/dev/null
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-g: $name measured"
}

echo "[queue-r5g] waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "[queue-r5g] tunnel up at $(date -u +%H:%M:%S)" >&2

W188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16"
L512="BENCH_DOC_TOKENS=484 BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=512 BENCH_MICROBATCH=8 BENCH_OPT_MOMENTS=factored BENCH_STEPS=16"
VARLEN="BENCH_DOC_LOGNORMAL=1 BENCH_CORPUS_PACKED=1"
BKT="BENCH_SCORE_BUCKETS=64,96,128,160 BENCH_SCORE_CHUNK=256"

# --- 1. the 10x attempt + its controls
run scored256_bkt_188 2400 fused $W188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 $VARLEN $BKT
run scored256_ln_188  2400 fused $W188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 $VARLEN BENCH_SCORE_CHUNK=1024
run ref_varlen        1200 ref   BENCH_DOC_LOGNORMAL=1 BENCH_STEPS=20

# --- 2. curve + granularity
run scored64_bkt_188    2400 fused $W188 BENCH_SCORED_POOL=64 $VARLEN $BKT
run scored256_bkt_c512  2400 fused $W188 BENCH_SCORED_POOL=256 BENCH_POOL=1000 $VARLEN BENCH_SCORE_BUCKETS=64,96,128,160 BENCH_SCORE_CHUNK=512

# --- 3. retries of queue-f arms lost to driver-bench preemption
#        (v3_acc_res_512=2.812 and acc_res_512=2.349 landed; these didn't)
run v3_acc_512       3000 fused $L512 BENCH_FLASH_V3=1 BENCH_FUSED_QKV=1 BENCH_GRAD_ACCUM=bf16
run scored64_acc_res 2400 fused $W188 BENCH_SCORED_POOL=64

# --- 4. round-close cache warm-up on the NEW defaults
run_full warm_full_1 2500
run_full warm_full_2 2500

echo "[queue-r5g] done at $(date -u +%H:%M:%S)" >&2
