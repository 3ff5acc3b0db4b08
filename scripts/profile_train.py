"""Single-chip training-step throughput (SFT shape, bf16 + remat).

Measures the jitted multimodal train step — frozen ViT, trainable
connector+LLM (the reference finetune recipe's trainable set,
scripts/vllava/finetune.sh) — at a ~0.7B LLM scale that fits one 16 GB
chip with Adam state, and reports step time, tokens/sec, and model-FLOPs
utilization. TRAIN_SIZE=tiny for a CPU smoke.

The reference's training throughput lives entirely inside HF Trainer +
DeepSpeed and is never measured standalone; this gives the rebuild a
per-chip training baseline to scale with the mesh.
"""

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
    import optax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.train import step as step_lib

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    size = os.environ.get("TRAIN_SIZE", "base" if on_tpu else "tiny")
    if size == "tiny":
        cfg = cfglib.tiny_model()
        B, S = 2, 64
    elif size == "7b-lora":
        # the reference QLoRA recipe at full model scale: frozen int8
        # Mistral-7B base + r=128 adapters + trainable projector
        # (scripts/custom/finetune_qlora.sh: --bits 4/8 --lora_r 128
        # --lora_alpha 256, seq 2048)
        cfg = cfglib.preset("videollama2_mistral")
        B, S = (int(os.environ.get("TRAIN_B", "2")),
                int(os.environ.get("TRAIN_S", "2048")))
    else:
        # ~0.7B-LLM SFT shape: hidden 1536 x 16 layers, CLIP-L/336 tower
        import dataclasses
        cfg = cfglib.preset("videollama2_mistral")
        cfg = dataclasses.replace(
            cfg,
            llm=dataclasses.replace(
                cfg.llm, hidden_size=1536, intermediate_size=6144,
                num_layers=16, num_heads=12, num_kv_heads=4, head_dim=128,
                vocab_size=32000),
            connector=dataclasses.replace(cfg.connector, hidden_size=1536),
            num_frames=8)
        B, S = (int(os.environ.get("TRAIN_B", "2")),
                int(os.environ.get("TRAIN_S", "1024")))

    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    # timing-equivalent constant fills materialized ON the device (values
    # don't affect MXU/HBM timing; avoids minutes of host init + tunnel
    # upload — same trick as bench.py)
    abstract = jax.eval_shape(lambda: vl2.init_params(
        jax.random.PRNGKey(0), cfg,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32))
    if size == "7b-lora":
        from videollama2_tpu.train import lora as lora_lib
        from videollama2_tpu.train import optimizer as opt_lib
        from videollama2_tpu.utils import synthetic
        bits = int(os.environ.get("TRAIN_BITS", "8"))
        abstract = synthetic.quantized_abstract(abstract, quantize_llm=True,
                                                llm_bits=bits)
        params = synthetic.materialize_fills(abstract)
        lcfg = lora_lib.LoraConfig(r=128, alpha=256)
        # bf16 adapters (peft's compute dtype in the reference bf16 runs):
        # r=128 over 7 matmul families is 335M adapter params — f32
        # storage + f32 AdamW moments alone would cost 4 GB of the 16
        params["llm"] = lora_lib.inject_lora(jax.random.PRNGKey(0),
                                             params["llm"], lcfg,
                                             dtype=jnp.bfloat16)
        ocfg = opt_lib.OptimizerConfig(lora_enable=True)
        mask = opt_lib.trainable_mask(params, ocfg)
        tx = opt_lib.build_optimizer(params, ocfg)
    else:
        params = jax.jit(lambda: jax.tree.map(
            lambda a: jnp.full(a.shape, 0.01, a.dtype), abstract))()
        jax.block_until_ready(params)
        # frozen tower (reference train.py:534); connector+LLM trainable
        mask = jax.tree.map(lambda _: True, params)
        mask["vision"] = jax.tree.map(lambda _: False, params["vision"])
        tx = optax.adamw(1e-5)
    state = step_lib.init_state(params, tx)
    remat = {"full": True, "dots": "dots", "none": False}[
        os.environ.get("TRAIN_REMAT", "full")]
    train_step = step_lib.make_train_step(cfg, tx, trainable=mask,
                                          remat=remat)

    from videollama2_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from videollama2_tpu.train import data as data_lib
    ids, labels = [], []
    for _ in range(B):
        hi = min(1000, cfg.llm.vocab_size - 1)
        toks = [1, VIDEO_TOKEN_INDEX] + [int(x) for x in
                                         rng.integers(4, hi, 48)]
        ids.append(toks)
        labels.append([IGNORE_INDEX, IGNORE_INDEX] + toks[2:])
    plan = data_lib.plan_batch(ids, cfg.tokens_per_video, S,
                               batch_labels=labels)
    batch = data_lib.Batch(
        frames=rng.integers(0, 255, (B, T, H, H, 3), dtype=np.uint8),
        text_ids=plan.text_ids, is_visual=plan.is_visual,
        vis_index=plan.vis_index, positions=plan.positions,
        valid_len=plan.valid_len, labels=plan.labels)

    t0 = time.time()
    state, metrics = train_step(state, batch)
    loss = np.asarray(metrics["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.3f}",
          file=sys.stderr, flush=True)

    iters = 8 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        state, metrics = train_step(state, batch)
    np.asarray(metrics["loss"])
    dt = (time.time() - t0) / iters

    # model FLOPs: 6 * N_trainable * tokens (fwd+bwd) + frozen tower fwd
    lcfg = cfg.llm
    n_llm = (lcfg.num_layers * (
        lcfg.hidden_size * lcfg.head_dim * (lcfg.num_heads
                                            + 2 * lcfg.num_kv_heads)
        + lcfg.num_heads * lcfg.head_dim * lcfg.hidden_size
        + 3 * lcfg.hidden_size * lcfg.intermediate_size)
        + 2 * lcfg.vocab_size * lcfg.hidden_size)
    toks = B * S
    # frozen-base LoRA: fwd (2N) + dgrad through the base (2N), no base
    # wgrad — 4N useful FLOPs/token vs 6N for full finetuning
    flops = (4 if size == "7b-lora" else 6) * n_llm * toks
    peak = 197e12 if on_tpu else 1e12
    print(f"train step ({size}): {dt*1e3:.1f} ms/step, "
          f"{toks/dt:.0f} tok/s, llm-param count {n_llm/1e9:.2f}B, "
          f"~{flops/dt/1e12:.1f} TF/s ({100*flops/dt/peak:.0f}% of peak, "
          f"LLM fwd+bwd only — tower/connector excluded)", flush=True)


if __name__ == "__main__":
    main()
