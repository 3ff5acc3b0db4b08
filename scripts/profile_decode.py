"""Focused decode-throughput profile (int8 weights, scan decode chunk)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib

    from videollama2_tpu.utils import synthetic

    cfg = cfglib.preset("videollama2_mistral").llm
    B = int(os.environ.get("B", "8"))

    # shape host-side, fill ON-device (no multi-GB tunnel upload)
    labstract = jax.eval_shape(lambda: llm_lib.init_params(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    quant = os.environ.get("QUANT", "1") == "1"
    bits = int(os.environ.get("BITS", "8"))
    if quant:
        labstract = synthetic.quantized_llm_abstract(labstract, bits=bits)
    lparams = synthetic.materialize_fills(labstract)
    if quant and os.environ.get("FUSEQKV", "1") == "1":
        from videollama2_tpu.ops import quant as quant_lib
        lparams = quant_lib.fuse_qkv(lparams)

    # KV_BITS=8: int8 KV cache (halved attention reads). The default
    # MAXLEN=2080 has no 128-multiple divisor, so the kernel's quantized
    # block rule falls back to a 2048-row pipelined block only if M allows;
    # pass MAXLEN=2048 or 2560 for the engine-shaped (256-aligned) case.
    kv_bits = int(os.environ.get("KV_BITS", "16"))
    M = int(os.environ.get("MAXLEN", "2080"))
    bucket = M - 32
    cache = llm_lib.init_cache(cfg, B, M, jnp.bfloat16, kv_bits=kv_bits)
    valid_len = jnp.full((B,), bucket - 100)

    from videollama2_tpu.ops import layers as layers_ops

    def chunk(p, tok, cache, valid_len):
        def step(carry, xs):
            tok, cache = carry
            te = llm_lib.embed_tokens(p, tok[:, None], dtype=jnp.bfloat16)
            logits, cache = llm_lib.decode_step(p, cfg, te, cache,
                                                valid_len, bucket, xs)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, cache), None

        # inference context: q8 lm_head keeps its W8A8 fast path (dense()
        # gates activation-quantizing kernels on this, ops/layers)
        with layers_ops.quant_inference(True):
            (tok, cache), _ = jax.lax.scan(
                step, (tok, cache), jnp.arange(32, dtype=jnp.int32))
        return tok, cache

    fn = jax.jit(chunk, donate_argnums=(2,))
    tok = jnp.zeros((B,), jnp.int32)
    # sync via device->host readback: on the axon tunnel block_until_ready
    # returns before execution finishes (see scripts/profile_kernels.py)
    tok, cache = fn(lparams, tok, cache, valid_len)
    np.asarray(tok)
    iters = int(os.environ.get("ITERS", "4"))
    t0 = time.time()
    for _ in range(iters):
        tok, cache = fn(lparams, tok, cache, valid_len)
    np.asarray(tok)
    t = (time.time() - t0) / iters
    per = t / 32
    wbytes = sum(leaf.size * leaf.dtype.itemsize
                 for leaf in jax.tree.leaves(lparams))
    tag = f"int{bits}" if quant else "bf16"
    print(f"decode B={B} {tag}: {per*1e3:.2f} ms/tok, "
          f"weight stream {wbytes/per/1e9:.0f} GB/s "
          f"({wbytes/1e9:.1f} GB/step), "
          f"{B/per:.1f} tok/s aggregate")


if __name__ == "__main__":
    main()


def unrolled():
    """UNROLL=1 variant: python-unrolled layers with static slices."""
    import jax
    import jax.numpy as jnp
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.ops.layers import rms_norm, apply_rope, dense, \
        rope_table
    from videollama2_tpu.ops import attention as attn_ops

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = cfglib.preset("videollama2_mistral").llm
    B = int(os.environ.get("B", "8"))
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        lshape = jax.eval_shape(lambda: llm_lib.init_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16))
        lparams = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype),
                               lshape)
        layers = dict(lparams["layers"])
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            e = dict(layers[name])
            w = e.pop("kernel")
            e["kernel_q8"] = {"q": jnp.ones(w.shape, jnp.int8),
                              "scale": jnp.full(
                                  w.shape[:-2] + (1, w.shape[-1]), 1e-4,
                                  jnp.float32)}
            layers[name] = e
        lparams["layers"] = layers
    lparams = jax.device_put(lparams, dev)

    M = int(os.environ.get("MAXLEN", "2080"))
    bucket = M - 32
    cache = llm_lib.init_cache(cfg, B, M, jnp.bfloat16)
    valid_len = jnp.full((B,), bucket - 100)

    L = cfg.num_layers

    def one_token(p, x, ck_all, cv_all, step):
        positions = (valid_len + step)[:, None]
        cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
        write_pos = bucket + step
        ki = jnp.arange(M)[None, :]
        mask = ((ki < valid_len[:, None]) |
                ((ki >= bucket) & (ki <= write_pos)))[:, None, None, :]
        new_ks, new_vs = [], []
        H, K, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        for l in range(L):
            lp = jax.tree.map(lambda a: a[l], p["layers"])
            h = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_norm_eps)
            q = dense(h, lp["q"]).reshape(B, 1, H, hd)
            k = dense(h, lp["k"]).reshape(B, 1, K, hd)
            v = dense(h, lp["v"]).reshape(B, 1, K, hd)
            q, k = apply_rope(q, k, cos, sin)
            ck = jax.lax.dynamic_update_slice(
                ck_all[l], k.astype(cache.k.dtype), (0, write_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv_all[l], v.astype(cache.v.dtype), (0, write_pos, 0, 0))
            new_ks.append(ck); new_vs.append(cv)
            out = attn_ops.mha_xla(q, ck.astype(q.dtype),
                                   cv.astype(q.dtype), mask=mask)
            x = x + dense(out.reshape(B, 1, H * hd), lp["o"])
            h = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
            g = jax.nn.silu(dense(h, lp["gate"]))
            u = dense(h, lp["up"])
            x = x + dense(g * u, lp["down"])
        x = rms_norm(x, p["final_norm"]["scale"], cfg.rms_norm_eps)
        logits = llm_lib.lm_logits(p, cfg, x[:, 0])
        return logits, new_ks, new_vs

    def chunk(p, tok, cks, cvs, _):
        def body(carry, step):
            tok, cks, cvs = carry
            te = llm_lib.embed_tokens(p, tok[:, None], dtype=jnp.bfloat16)
            logits, cks, cvs = one_token(p, te, cks, cvs, step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, cks, cvs), None
        (tok, cks, cvs), _ = jax.lax.scan(
            body, (tok, cks, cvs), jnp.arange(32, dtype=jnp.int32))
        return tok, cks, cvs

    # un-merge the cache layout for this per-layer mha_xla diagnostic
    cks = [cache.k[l].reshape(B, M, cfg.num_kv_heads, cfg.head_dim)
           for l in range(L)]
    cvs = [cache.v[l].reshape(B, M, cfg.num_kv_heads, cfg.head_dim)
           for l in range(L)]
    fn = jax.jit(chunk, donate_argnums=(2, 3))
    tok = jnp.zeros((B,), jnp.int32)
    out = jax.block_until_ready(fn(lparams, tok, cks, cvs, None))
    tok2, cks, cvs = out
    t0 = time.time()
    out = jax.block_until_ready(fn(lparams, tok, cks, cvs, None))
    t = time.time() - t0
    print(f"UNROLLED decode B={B}: {t/32*1e3:.2f} ms/tok, "
          f"{7.1e9/(t/32)/1e9:.0f} GB/s weight stream", flush=True)

