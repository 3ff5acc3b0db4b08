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

# ---- round 5 queue ----
# int8 KV cache decode floor (VERDICT r5 #1 gate: <=12.2 ms/tok int8/B=8).
# MAXLEN=2048 so the quantized kernel gets a 512-row pipelined block; the
# kv16 run at the same MAXLEN is the same-weather baseline.
run profile_decode_kv8 1200 env KV_BITS=8 MAXLEN=2048 python scripts/profile_decode.py
run profile_decode_kv16 1200 env MAXLEN=2048 python scripts/profile_decode.py
# int4 weights + int8 KV (gate: <=9.7 ms/tok)
run profile_decode_int4_kv8 1200 env BITS=4 KV_BITS=8 MAXLEN=2048 python scripts/profile_decode.py
# B=16 decode over the halved cache (the headline lever)
run profile_decode_kv8_b16 1200 env KV_BITS=8 MAXLEN=2048 B=16 python scripts/profile_decode.py
# headline bench candidates: B=16 + kv8, and B=8 + kv8 for comparison
run bench_b16_kv8 2400 env BENCH_BATCH=16 BENCH_KV_BITS=8 python bench.py
run bench_b8_kv8 2400 env BENCH_KV_BITS=8 python bench.py
# quiet re-runs (VERDICT r5 #6): int4 and qwen2 headline configs
run bench_int4 2400 env BENCH_BITS=4 python bench.py
run bench_qwen2 2400 env BENCH_MODEL=qwen2 python bench.py
# training step attribution (VERDICT r5 #3)
run profile_train_attrib 2400 env ATTRIB=1 python scripts/profile_train.py
# 7B int8 continuous-batching serving (VERDICT r5 #4): synthetic on-device
# weights through the real worker/batcher stack; tokenizer from the tiny
# offline checkpoint (ids are a subset of the 32k vocab)
python scripts/make_tiny_checkpoint.py > /tmp/tpu_queue/make_ckpt.out 2>&1
run bench_serving_7b 3000 python scripts/bench_serving.py \
  --model-path "synthetic://videollama2_mistral?bits=8&kv_bits=8&max_len=512&tokenizer=/tmp/tiny_vllama2_ckpt" \
  --platform tpu --requests 24 --concurrency 8 --max-new-tokens 64
# NOTE: the headline bench default config is still run by the driver at
# round end; run `python bench.py` manually while iterating.

echo "$(date +%T) queue complete" >> /tmp/tpu_queue/status.log
