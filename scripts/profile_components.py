"""Per-component timing on the real chip: ViT encode, connector, prefill,
decode chunk. Identifies the wall-clock distribution behind bench.py.

Sync methodology: on the axon remote tunnel `jax.block_until_ready` returns
before execution finishes; only a device->host readback is a real sync, and
per-dispatch overhead is ~2 ms (docs/DESIGN.md "Measurement methodology").

Stage selection: STAGES=vit,conn,prefill,decode (default all, in order).
Running `STAGES=decode` isolates decode from the preceding MXU-heavy burn —
the two orderings have measured differently on this chip, so attribution
needs both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0].ravel()[:8])


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def run_vit(jax, jnp, cfg, cpu, dev, rng, N_FRAMES):
    from videollama2_tpu.models import vit as vit_lib
    from videollama2_tpu.ops import layers as layers_ops

    q8 = os.environ.get("VIT_Q8", "0") == "1"
    with jax.default_device(cpu):
        vshape = jax.eval_shape(lambda: vit_lib.init_params(
            jax.random.PRNGKey(0), cfg.vision, jnp.bfloat16))
        vparams = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype),
                               vshape)
        if q8:  # VIT_Q8=1: int8 tower + W8A8 MXU dots (load_8bit parity)
            from videollama2_tpu.ops import quant as quant_lib
            vparams = quant_lib.quantize_vision_params(vparams)
    vparams = jax.device_put(vparams, dev)
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (N_FRAMES, 336, 336, 3), dtype=np.uint8)
        .astype(np.float32) / 255.0, jnp.bfloat16), dev)

    def fwd(p, x):
        with layers_ops.w8a8_prefill(q8):
            return vit_lib.features(p, cfg.vision, x)

    vit_fn = jax.jit(fwd)
    t_vit = timeit(vit_fn, vparams, frames)
    del frames
    flops_vit = N_FRAMES * 23 * (4 * 577 * 1024 * 1024 * 2
                                 + 2 * 577 * 577 * 1024 * 2
                                 + 2 * 577 * 1024 * 4096 * 2)
    print(f"ViT encode {N_FRAMES}f{' int8' if q8 else ''}: "
          f"{t_vit*1e3:.1f} ms ({flops_vit/t_vit/1e12:.1f} TF/s)",
          flush=True)
    for t in jax.tree.leaves(vparams):
        t.delete()


def run_conn(jax, jnp, cfg, cpu, dev, B, T):
    from videollama2_tpu.models import connector as conn_lib

    with jax.default_device(cpu):
        cshape = jax.eval_shape(lambda: conn_lib.init_params(
            jax.random.PRNGKey(0), cfg.connector, jnp.bfloat16))
        cparams = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype),
                               cshape)
    cparams = jax.device_put(cparams, dev)
    feats = jax.device_put(
        jnp.full((B, T, 576, 1024), 0.1, jnp.bfloat16), dev)
    conn_fn = jax.jit(lambda p, x: conn_lib.apply(p, cfg.connector, x))
    t_conn = timeit(conn_fn, cparams, feats)
    print(f"STC connector: {t_conn*1e3:.1f} ms", flush=True)
    for t in jax.tree.leaves(cparams) + [feats]:
        t.delete()


def build_llm_params(jax, jnp, cfg, cpu, dev):
    from videollama2_tpu.models import llm as llm_lib

    with jax.default_device(cpu):
        lshape = jax.eval_shape(lambda: llm_lib.init_params(
            jax.random.PRNGKey(0), cfg.llm, jnp.bfloat16))
        lparams = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype),
                               lshape)
        layers = dict(lparams["layers"])
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            e = dict(layers[name])
            w = e.pop("kernel")
            e["kernel_q8"] = {"q": jnp.ones(w.shape, jnp.int8),
                              "scale": jnp.full(w.shape[:-2] +
                                                (1, w.shape[-1]),
                                                1e-4, jnp.float32)}
            layers[name] = e
        lparams["layers"] = layers
        if os.environ.get("FUSEQKV", "1") == "1":
            from videollama2_tpu.ops import quant as quant_lib
            lparams = quant_lib.fuse_qkv(lparams)
    return jax.device_put(lparams, dev)


def run_prefill(jax, jnp, cfg, dev, lparams, B):
    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.ops import layers as layers_ops

    # PREFILL_B/PREFILL_S: measure at a specific shape (the B=16 headline
    # bucket is S=1664). W8A8=1 runs the engine's s8xs8 MXU path (the
    # quant-inference contexts wrap INSIDE jit, exactly like Engine's
    # prefill programs); default measures the dequant-to-bf16 dot.
    B = int(os.environ.get("PREFILL_B", B))
    S = int(os.environ.get("PREFILL_S", "2048"))
    w8a8_list = [x == "1" for x in os.environ.get("W8A8", "0").split(",")]
    embeds = jax.device_put(jnp.full((B, S, 4096), 0.1, jnp.bfloat16), dev)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.full((B,), S - 100)

    impl = "pallas"  # xla impl materializes 4 GB of probs at B8/S2048
    for w8a8 in w8a8_list:
        def body(p, e):
            with layers_ops.quant_inference(True), \
                    layers_ops.w8a8_prefill(w8a8):
                return llm_lib.forward(p, cfg.llm, e, positions, valid,
                                       attn_impl=impl)[0]
        fn = jax.jit(body)
        t = timeit(fn, lparams, embeds)
        fl = B * S * 7.1e9 * 2
        print(f"prefill B={B} S={S} ({impl}{', w8a8' if w8a8 else ''}): "
              f"{t*1e3:.1f} ms ({fl/t/1e12:.1f} TF/s)", flush=True)
    del embeds


def run_decode(jax, jnp, cfg, lparams, B):
    from videollama2_tpu.models import llm as llm_lib

    M = 2048 + 32
    bucket = 2048
    cache = llm_lib.init_cache(cfg.llm, B, M, jnp.bfloat16)
    valid_len = jnp.full((B,), bucket - 100)

    def chunk(p, tok, cache, valid_len):
        from videollama2_tpu.ops import layers as layers_ops

        def step(carry, xs):
            tok, cache = carry
            te = llm_lib.embed_tokens(p, tok[:, None], dtype=jnp.bfloat16)
            logits, cache = llm_lib.decode_step(p, cfg.llm, te, cache,
                                                valid_len, bucket, xs)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, cache), None

        with layers_ops.quant_inference(True):
            (tok, cache), _ = jax.lax.scan(
                step, (tok, cache), jnp.arange(32, dtype=jnp.int32))
        return tok, cache

    fn = jax.jit(chunk, donate_argnums=(2,))
    tok = jnp.zeros((B,), jnp.int32)
    tok_o, cache = fn(lparams, tok, cache, valid_len)
    np.asarray(tok_o)
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        tok_o, cache = fn(lparams, tok_o, cache, valid_len)
    np.asarray(tok_o)
    t_dec = (time.time() - t0) / iters
    per_tok = t_dec / 32
    bw = 7.1e9 / per_tok  # int8 weights read per token
    print(f"decode chunk 32 (B={B}): {t_dec*1e3:.1f} ms "
          f"({per_tok*1e3:.2f} ms/tok, weight-stream {bw/1e9:.0f} GB/s)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib

    cfg = cfglib.preset("videollama2_mistral").replace(num_frames=16)
    B, T = 8, 16
    N_FRAMES = B * T
    rng = np.random.default_rng(0)

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    stages = os.environ.get("STAGES", "vit,conn,prefill,decode").split(",")

    if "vit" in stages:
        run_vit(jax, jnp, cfg, cpu, dev, rng, N_FRAMES)
    if "conn" in stages:
        run_conn(jax, jnp, cfg, cpu, dev, B, T)
    lparams = None
    if "prefill" in stages or "decode" in stages:
        lparams = build_llm_params(jax, jnp, cfg, cpu, dev)
    if "prefill" in stages:
        run_prefill(jax, jnp, cfg, dev, lparams, B)
    if "decode" in stages:
        run_decode(jax, jnp, cfg, lparams, B)


if __name__ == "__main__":
    main()
