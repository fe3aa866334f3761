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
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/queue_r4b.run.pid

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
echo "r4b: waiting for TPU tunnel..." >&2
until probe; do sleep 60; done
echo "r4b: tunnel up at $(date -u +%H:%M:%S)" >&2

run() { # name, timeout_s, phase, env...
  local name="$1" t="$2" phase="$3"; shift 3
  echo "[queue-r4b] $name starting at $(date -u +%H:%M:%S)" >&2
  local out
  out=$(env "$@" BENCH_PHASE="$phase" timeout "$t" python bench.py 2>/tmp/q_err_r4b.txt)
  if [ -n "$out" ]; then
    echo "{\"exp\": \"$name\", $(echo "$out" | tail -1 | sed 's/^{//')"
  else
    echo "{\"exp\": \"$name\", \"failed\": \"$(tail -c 200 /tmp/q_err_r4b.txt | tr '\"\n' ' ')\"}"
  fi
}

# dense-vs-packed serving A/B on the SAME varlen length distribution:
# the dense number on a varlen corpus is what the reference pays (every doc
# padded to max); packed+buckets is the TPU-native serving path.
run rerank_packed      2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1
run rerank_packed_int8 2400 rerank BENCH_STEPS=40 BENCH_RERANK_PACKED=1 BENCH_RERANK_INT8=1
echo "r4b queue done at $(date -u +%H:%M:%S)" >&2
