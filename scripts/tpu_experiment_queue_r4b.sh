#!/bin/bash
# Round-4 follow-on queue: packed/length-bucketed rerank serving arms
# (eval/rerank.py packed + bucket_lens; bench.py BENCH_RERANK_PACKED).
# Waits for the primary r4 queue (scripts/tpu_experiment_queue_r4.sh) to
# finish so the two never contend for the single tunneled chip, then waits
# for the tunnel itself, then runs each arm. One JSON line per experiment.
#
# PID-FILE CONTRACT: queue scripts do not daemonize themselves; the
# LAUNCHER must record the pid (`bash <script> & echo $! > /tmp/<name>.pid`)
# so chained queues can wait on it. This script waits on
# /tmp/queue_r4.pid if present and WARNS if absent (it cannot then rule
# out a concurrent queue corrupting both sets of timings).
#
# CHIP ARBITRATION: same protocol as the primary queue — honors the
# driver bench's /tmp/pn_bench_driver.lock, advertises each experiment via
# BENCH_QUEUE=1, retries once if preempted.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/queue_r4b.run.pid

# see tpu_experiment_queue_r4.sh: results persist in the repo tree
RESULTS=docs/experiments_r4.jsonl

if [ -f /tmp/queue_r4.pid ]; then
  prev=$(cat /tmp/queue_r4.pid)
  while kill -0 "$prev" 2>/dev/null; do sleep 60; done
else
  echo "r4b: WARNING /tmp/queue_r4.pid missing — cannot wait for the" \
       "primary queue; if it is running, timings from BOTH queues are" \
       "contended garbage" >&2
fi

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_driver() {
  while [ -f /tmp/pn_bench_driver.lock ]; do
    local dp
    dp=$(cat /tmp/pn_bench_driver.lock 2>/dev/null)
    if [ -n "$dp" ] && kill -0 "$dp" 2>/dev/null; then
      echo "[queue-r4b] driver bench active (pid $dp); waiting" >&2
      sleep 30
    else
      rm -f /tmp/pn_bench_driver.lock
      break
    fi
  done
}

echo "r4b: waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "r4b: tunnel up at $(date -u +%H:%M:%S)" >&2

run_once() { # timeout_s, phase, env...
  # setsid: own process group per experiment — see tpu_experiment_queue_r4.sh
  local t="$1" phase="$2"; shift 2
  setsid env "$@" BENCH_QUEUE=1 BENCH_PHASE="$phase" \
    timeout "$t" python bench.py >/tmp/q_out_r4b.txt 2>/tmp/q_err_r4b.txt
}

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  wait_driver
  echo "[queue-r4b] $name starting at $(date -u +%H:%M:%S)" >&2
  run_once "$t" "$phase" "$@"
  local out
  out=$(tail -1 /tmp/q_out_r4b.txt 2>/dev/null)
  if [ -z "$out" ] && [ -f /tmp/pn_bench_driver.lock ]; then
    echo "[queue-r4b] $name preempted by driver bench; retrying after" >&2
    sleep 30
    wait_driver
    run_once "$t" "$phase" "$@"
    out=$(tail -1 /tmp/q_out_r4b.txt 2>/dev/null)
  fi
  local line
  if [ -n "$out" ]; then
    line="{\"exp\": \"$name\", $(echo "$out" | sed 's/^{//')"
  else
    line="{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r4b.txt | tr '\"\n' ' ')\"}"
  fi
  echo "$line"
  echo "$line" >> "$RESULTS"
}

# dense-vs-packed serving A/B on the SAME varlen length distribution:
# the dense number on a varlen corpus is what the reference pays (every doc
# padded to max); packed+buckets is the TPU-native serving path.
run rerank_packed      2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1
run rerank_packed_int8 2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1 BENCH_RERANK_INT8=1

# --- round-close validation (VERDICT r3 item 1d): re-warm .jax_cache and
# validate the FULL default bench end-to-end, twice — run 1 fills any cold
# cache entries, run 2 records the warm-cache wall time the driver's
# end-of-round run will see. Queue-mode parent (BENCH_QUEUE=1, no phase):
# advertised for driver preemption, takes no driver lock — if the driver's
# official run lands mid-warm-up it preempts this group and supersedes it.
for i in 1 2; do
  wait_driver
  echo "[queue-r4b] warm full bench $i starting at $(date -u +%H:%M:%S)" >&2
  t0=$SECONDS
  setsid env BENCH_QUEUE=1 timeout 2000 python bench.py \
    >"/tmp/warm_bench$i.json" 2>"/tmp/warm_bench$i.err"
  rc=$?
  wall=$((SECONDS - t0))
  last=$(tail -n 1 "/tmp/warm_bench$i.json" 2>/dev/null)
  echo "[queue-r4b] warm full bench $i done rc=$rc wall=${wall}s at" \
       "$(date -u +%H:%M:%S)" >&2
  if [ -n "$last" ]; then
    echo "{\"exp\": \"warm_full_$i\", \"rc\": $rc, \"wall_s\": $wall, $(echo "$last" | sed 's/^{//')" >> "$RESULTS"
  else
    echo "{\"exp\": \"warm_full_$i\", \"rc\": $rc, \"wall_s\": $wall, \"failed\": \"no output\"}" >> "$RESULTS"
  fi
done
echo "r4b queue done at $(date -u +%H:%M:%S)" >&2
