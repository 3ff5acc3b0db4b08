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

# ---- round 5d queue (per-config refreshes on the I420 wire) ----
# int4 at the headline batch: int4 weights (3.6 GB) + kv8 cache leave
# B=16 plenty of HBM headroom; decode weight-DMA halves vs int8
run bench_int4_b16 2400 env BENCH_BITS=4 python bench.py
# qwen2 flagship on the new wire (its SigLIP 384px frames were 57 MB RGB)
run bench_qwen2_i420 2400 env BENCH_MODEL=qwen2 python bench.py
# isolated decode at the int4+kv8 B=16 shape (floor bookkeeping)
run profile_decode_int4_kv8_b16 1200 env BITS=4 KV_BITS=8 B=16 MAXLEN=2048 python scripts/profile_decode.py
# headline repeat for a third weather sample
run bench_i420_c 2400 python bench.py

echo "$(date +%T) queue complete" >> /tmp/tpu_queue/status.log
