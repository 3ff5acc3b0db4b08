"""Multi-turn latency: prefix-cached session vs fresh re-prefill per turn.

Measures what a chat user feels on turn 2+: the reference re-runs the
vision tower + full-history prefill every turn; the Session path feeds
only the new turn's tokens. At 7B-int8 + 16-frame video the skipped work
is the entire encode+prefill stage (~2-3 s on one v5e chip).

Env: SESS_SIZE=tiny|7b (default by platform), PLATFORM=cpu.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.inference.engine import Engine, GenerationConfig
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.ops import quant
    from videollama2_tpu.constants import VIDEO_TOKEN_INDEX

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    size = os.environ.get("SESS_SIZE", "7b" if on_tpu else "tiny")

    if size == "tiny":
        cfg = cfglib.tiny_model()
        dtype = jnp.float32
    else:
        import dataclasses
        cfg = cfglib.preset("videollama2_mistral")
        cfg = dataclasses.replace(cfg, num_frames=16)
        dtype = jnp.bfloat16
    if size != "tiny":
        # int8 packs built directly + filled on-device: a bf16 7B tree
        # plus its packs would OOM the 16 GB chip (utils/synthetic.py)
        from videollama2_tpu.utils import synthetic
        params = synthetic.synthetic_model_params(
            cfg, dtype=jnp.bfloat16, quantize_llm=True)
    else:
        params = vl2.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16 if on_tpu
                                 else jnp.float32)

    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    frames = rng.integers(0, 255, (1, T, H, H, 3), dtype=np.uint8)
    prompt1 = [1] + [int(x) for x in rng.integers(10, 900, 20)] \
        + [VIDEO_TOKEN_INDEX] + [int(x) for x in rng.integers(10, 900, 10)]
    turn2 = [int(x) for x in rng.integers(10, 900, 24)]
    spliced = len(prompt1) - 1 + cfg.tokens_per_video
    bucket = -(-spliced // 128) * 128 if on_tpu else 64
    gen = GenerationConfig(max_new_tokens=16)

    eng = Engine(cfg, params, dtype=dtype, buckets=(bucket,),
                 max_len=bucket + 256 if on_tpu else 128,
                 attn_impl="auto" if on_tpu else "xla",
                 decode_chunk=16)

    # warmup/compile both paths
    ans1, sess = eng.generate([prompt1], frames=frames, gen=gen,
                              eos_token_id=-1, return_session=True)
    eng.generate_continue(sess, turn2, gen=gen, eos_token_id=-1)

    iters = 4 if on_tpu else 2
    fresh_s, cont_s = [], []
    for _ in range(iters):
        t0 = time.time()
        ans1, sess = eng.generate([prompt1], frames=frames, gen=gen,
                                  eos_token_id=-1, return_session=True)
        fresh_s.append(time.time() - t0)
        t0 = time.time()
        eng.generate_continue(sess, turn2, gen=gen, eos_token_id=-1)
        cont_s.append(time.time() - t0)

    fresh = float(np.median(fresh_s))
    cont = float(np.median(cont_s))
    print(f"[sess-bench] turn-1 (encode+prefill+16 tok): {fresh:.3f}s; "
          f"turn-2 cached ({len(turn2)} new toks + 16 out): {cont:.3f}s; "
          f"turn-2 fresh would pay turn-1 cost again",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "size": size, "bucket": bucket,
        "turn1_fresh_s": round(fresh, 3),
        "turn2_cached_s": round(cont, 3),
        "turn2_speedup_vs_fresh": round(fresh / cont, 2)}))


if __name__ == "__main__":
    main()
