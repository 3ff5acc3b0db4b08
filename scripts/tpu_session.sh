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

# ---- round 5b queue (re-runs after the Mosaic LSE fix + serving fix) ----
# driver-path validation: plain bench.py now defaults to B=16 + kv8
run bench_default 2400 python bench.py
# training step attribution (VERDICT r5 #3) — first TPU exercise of the
# tiled Pallas flash backward (the 5a run died on the [B,H,S] LSE layout)
run profile_train_attrib 2400 env ATTRIB=1 python scripts/profile_train.py
# the reference SFT seq length with the tiled backward (gate: >=60 TF/s
# useful or an airtight floor analysis)
run profile_train_s2048 2400 env TRAIN_S=2048 TRAIN_B=4 python scripts/profile_train.py
# 7B int8 continuous-batching serving (VERDICT r5 #4): synthetic on-device
# weights through the real worker/batcher stack; tokenizer from the tiny
# offline checkpoint (ids are a subset of the 32k vocab). bench_serving now
# loads ONE model bundle shared across serial+dynamic (the 5a run OOM'd
# loading a second 7B tree)
python scripts/make_tiny_checkpoint.py > /tmp/tpu_queue/make_ckpt.out 2>&1
run bench_serving_7b 3000 python scripts/bench_serving.py \
  --model-path "synthetic://videollama2_mistral?bits=8&kv_bits=8&max_len=512&tokenizer=/tmp/tiny_vllama2_ckpt" \
  --platform tpu --requests 24 --concurrency 8 --max-new-tokens 64
# 7B QLoRA step with the tiled backward (was 889 ms/step with the XLA
# probs-materializing backward)
run profile_train_qlora 2400 env TRAIN_SIZE=7b-lora TRAIN_BITS=4 TRAIN_B=1 python scripts/profile_train.py

echo "$(date +%T) queue complete" >> /tmp/tpu_queue/status.log
