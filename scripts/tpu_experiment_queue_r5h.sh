#!/bin/bash
# Round-5 queue H: validate the NEW default bench end-to-end and probe the
# bucketed scored-pool asymptote.
#
# Context (docs/experiments_r5.jsonl): the fused_scored default phase now
# runs the measured-best bucketed varlen config (C=256, buckets
# 64/96/128/160, chunk 256 — 5,257 neg scored/s = 16.6x the matched
# ref_varlen control), with ref_varlen as a new control phase, ordered
# before fused512/scale so a squeezed budget can't skip the north-star
# keys. Queue-g's warm_full runs were killed rc=143 NOT by the tunnel but
# by the test suite's unisolated contract tests preempting the live queue
# (fixed: tests/test_bench_contract.py _isolated_arbitration_env +
# bench.py CPU-forced-parent guard).
#
# Arms:
#   1. warm_full_3     — first FULL bench on the new phase list: validates
#                        scored_pool_* + north_star.scored_neg_multiple_*
#                        keys land in the official-format record and warms
#                        the compile cache for the driver's round close.
#   2. scored512_bkt_188 — asymptote probe: C=512 bucketed varlen. C=256
#                        measures 16.6x; the scoring-pass-only ceiling is
#                        ~6.3k neg/s, so C=512 should land ~18-19x if the
#                        bucket batching holds at 2x the rows.
#   3. warm_full_4     — warm-cache wall-time confirmation on the final
#                        defaults (the driver's official run should see
#                        every phase warm).
set -u
cd "$(dirname "$0")/.."

RESULTS=docs/experiments_r5.jsonl
echo $$ > /tmp/queue_r5h.pid

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r5h] driver bench active (pid $dp); waiting" >&2
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
  echo "[queue-r5h] WARNING: commit failed for: $msg" >&2
}

record() {
  local name="$1" rc="$2" wall="$3" out line
  out=$(tail -1 /tmp/q_out_r5h.txt 2>/dev/null)
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"$(tail -c 300 /tmp/q_err_r5h.txt | tr '\"\n' ' ')\"}"
    cp /tmp/q_err_r5h.txt "/tmp/q_err_r5h_${name}.txt" 2>/dev/null
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
  commit_results "r5 queue-h: $name measured"
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r5h] $name starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r5h.txt 2>/tmp/q_err_r5h.txt
  record "$name" $? $((SECONDS - t0))
}

run_full() { # name, timeout_s
  local name="$1" t="$2"; shift 2
  wait_driver
  echo "[queue-r5h] $name (full bench) starting at $(date -u +%H:%M:%S)" >&2
  local t0=$SECONDS
  setsid env BENCH_QUEUE=1 timeout "$t" python bench.py \
    >/tmp/q_out_r5h.txt 2>/tmp/q_err_r5h.txt
  record "$name" $? $((SECONDS - t0))
}

echo "[queue-r5h] waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "[queue-r5h] tunnel up at $(date -u +%H:%M:%S)" >&2

W188="BENCH_REMAT=0 BENCH_ATTN=chunked BENCH_ATTN_CHUNK=192 BENCH_MICROBATCH=4 BENCH_OPT_MOMENTS=factored BENCH_STEPS=20 BENCH_GRAD_ACCUM=bf16 BENCH_ATTN_RES=bf16"
VARLEN="BENCH_DOC_LOGNORMAL=1 BENCH_CORPUS_PACKED=1"
BKT="BENCH_SCORE_BUCKETS=64,96,128,160 BENCH_SCORE_CHUNK=256"

run_full warm_full_3 2500
run scored512_bkt_188 2400 fused $W188 BENCH_SCORED_POOL=512 BENCH_POOL=1000 $VARLEN $BKT
run_full warm_full_4 2500

echo "[queue-r5h] done at $(date -u +%H:%M:%S)" >&2
