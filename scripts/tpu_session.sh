#!/bin/bash
# TPU measurement queue: waits for the axon tunnel to come back, then runs
# the round-3 profiling set serially, logging to /tmp/tpu_queue/.
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

# decode floor first (shortest, most load-sensitive)
run profile_decode 1200 python scripts/profile_decode.py
# int4 folded-nibble decode (beats int8 since the offset-binary unpack)
run profile_decode_int4 1200 env BITS=4 python scripts/profile_decode.py
# spec-decode ceiling at 7B int8
run bench_speculative 2400 python scripts/bench_speculative.py
# component stages (encode/prefill/decode attribution)
run profile_components 2400 python scripts/profile_components.py
# decode isolated vs after-prefill ordering (the 14.7 vs 22.8 ms gap)
run profile_decode_isolated 1200 env STAGES=decode python scripts/profile_components.py
# int8 tower + W8A8 encode (the bench's load_8bit-parity config)
run profile_vit_q8 1200 env VIT_Q8=1 STAGES=vit python scripts/profile_components.py
# multi-turn prefix-cache latency
run bench_session 2400 python scripts/bench_session.py
# training step throughput
run profile_train 2400 python scripts/profile_train.py
# 7B QLoRA recipe (frozen int4 base, r=128 adapters) — B=1 fits 16 GB
run profile_train_7b_qlora 2400 env TRAIN_SIZE=7b-lora TRAIN_BITS=4 TRAIN_B=1 python scripts/profile_train.py
# NOTE: the headline bench is deliberately NOT here — the driver runs it
# at round end; run `python bench.py` manually while iterating.

echo "$(date +%T) queue complete" >> /tmp/tpu_queue/status.log
