#!/bin/bash
# TPU measurement queue: waits for the axon tunnel to come back, then runs
# the current measurement set serially, logging to /tmp/tpu_queue/.
# Each step is timeout-guarded; the probe itself is cheap and re-tried.
set -u
mkdir -p /tmp/tpu_queue
cd /root/repo

probe() {
  timeout 75 python -c "
import jax
d = jax.devices()[0]
assert d.platform == 'tpu', d.platform
import jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print('TPU OK')
" 2>/dev/null | grep -q "TPU OK"
}

echo "$(date +%T) waiting for TPU..." >> /tmp/tpu_queue/status.log
# deadline: stop waiting after ~4 h so a late-returning tunnel is left
# entirely to the driver's end-of-round bench (no chip contention)
tries=0
until probe; do
  tries=$((tries + 1))
  if [ "$tries" -gt 80 ]; then
    echo "$(date +%T) deadline reached — exiting without measurements"       >> /tmp/tpu_queue/status.log
    exit 0
  fi
  sleep 180
done
echo "$(date +%T) TPU up — running queue" >> /tmp/tpu_queue/status.log

run() {
  local name=$1; shift
  echo "$(date +%T) START $name" >> /tmp/tpu_queue/status.log
  timeout "$@" > "/tmp/tpu_queue/$name.out" 2> "/tmp/tpu_queue/$name.err"
  echo "$(date +%T) DONE $name rc=$?" >> /tmp/tpu_queue/status.log
}

# ---- round 5c queue (I420 wire + dispatch-bounded engine build) ----
# new headline config: B=16 int8+kv8 + I420 wire (43 MB/iter vs 86.7) —
# validates the driver path end-to-end; engine_build_s should now be ~1 s
# regardless of tunnel load (engine._prepare_single_chip)
run bench_i420 2400 python bench.py
# A/B on the same session: identical config over the RGB wire — the iter
# delta is the wire's wall-clock value on this tunnel
run bench_rgb_ab 2400 env BENCH_WIRE=rgb python bench.py
# second i420 run back-to-back: spread check + warm persistent cache
run bench_i420_b 2400 python bench.py

echo "$(date +%T) queue complete" >> /tmp/tpu_queue/status.log
