"""Micro-benchmark: ViT-shape attention variants on the real TPU.

Shapes: N=128 frames, S=640 (577 padded), H=16, hd=64 (CLIP-L/336).
Compares XLA attention, the generic flash kernel (whole-seq blocks), and
the encoder_attention kernel (MXU-side bias masking + multi-head cells)
at several heads_per_cell. Prints ms/layer-equivalent for each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:8])  # real sync (tunnel)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:8])
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.ops import attention as attn_ops
    from videollama2_tpu.ops import encoder_attention as enc_ops
    from videollama2_tpu.ops import flash_attention as flash_ops

    N, S, H, D = 128, int(os.environ.get("S", "640")), 16, 64
    valid = 577
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    q = jax.device_put(jax.random.normal(kq, (N, S, H, D), jnp.bfloat16), dev)
    k = jax.device_put(jax.random.normal(kk, (N, S, H, D), jnp.bfloat16), dev)
    v = jax.device_put(jax.random.normal(kv, (N, S, H, D), jnp.bfloat16), dev)
    vl = jax.device_put(jnp.full((N,), valid, jnp.int32), dev)

    flops = 4 * N * H * S * S * D

    def report(name, t):
        print(f"{name:34s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s",
              flush=True)

    xla = jax.jit(lambda q, k, v: attn_ops.attend_xla(
        q, k, v, valid_len=vl, causal=False))
    if os.environ.get("TOWER", "0") != "1":
        report("xla", timeit(xla, q, k, v))

    if os.environ.get("TOWER", "0") != "1":
        fl = jax.jit(lambda q, k, v: flash_ops.flash_attention(
            q, k, v, valid_len=vl, causal=False))
        report("flash whole-seq (b,h) cells", timeit(fl, q, k, v))

        # stage-cost attribution: drop kernel stages one at a time
        # (ABLATE=1; results are WRONG numerically, timing only)
        if os.environ.get("ABLATE", "0") == "1":
            for ab in ("mask", "mask,max", "mask,max,exp",
                       "mask,max,exp,sum"):
                enc = jax.jit(lambda q, k, v, ab=ab:
                              enc_ops.encoder_attention(
                                  q, k, v, valid_len=vl, ablate=ab))
                report(f"encoder_attention -[{ab}]", timeit(enc, q, k, v))

        # hp=16 blows the 16 MB VMEM scoped limit at S=640 (blocks alone
        # are ~21 MB with double-buffering); 8 is the VMEM-feasible max
        for hp in (1, 2, 4, 8):
            try:
                enc = jax.jit(
                    lambda q, k, v, hp=hp: enc_ops.encoder_attention(
                        q, k, v, valid_len=vl, heads_per_cell=hp,
                        pack_pairs=False))
                report(f"encoder_attention hp={hp}", timeit(enc, q, k, v))
            except Exception as e:  # noqa: BLE001 - keep sweeping
                print(f"encoder_attention hp={hp}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

        # block-diagonal head-pair packing: 2x dot FLOPs for full 128-lane
        # MXU passes and 2 (not 2*hp) dots per cell (VERDICT r3 #2)
        encp = jax.jit(lambda q, k, v: enc_ops.encoder_attention(
            q, k, v, valid_len=vl, pack_pairs=True))
        report("encoder_attention packed-pairs", timeit(encp, q, k, v))

    # ---- whole-tower decomposition: features() with real attention vs
    # attention stubbed to identity (everything-else time: dense, LN,
    # GELU, residuals, layout moves)
    if os.environ.get("TOWER", "0") == "1":
        from videollama2_tpu.core import config as cfglib
        from videollama2_tpu.models import vit as vit_lib

        cfg = cfglib.preset("videollama2_mistral").replace(num_frames=16)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            vshape = jax.eval_shape(lambda: vit_lib.init_params(
                jax.random.PRNGKey(0), cfg.vision, jnp.bfloat16))
            vparams = jax.tree.map(
                lambda a: jnp.full(a.shape, 0.01, a.dtype), vshape)
        vparams = jax.device_put(vparams, dev)
        pix = jax.device_put(jnp.asarray(np.random.default_rng(0).standard_normal(
            (128, cfg.vision.image_size, cfg.vision.image_size, 3),
            dtype=np.float32), jnp.bfloat16), dev)
        feat = jax.jit(lambda p, x: vit_lib.features(p, cfg.vision, x))
        t = timeit(feat, vparams, pix, iters=4)
        print(f"tower features (real attn): {t*1e3:7.1f} ms", flush=True)
        real_attend = attn_ops.attend
        try:
            attn_ops.attend = lambda q, k, v, **kw: q
            feat2 = jax.jit(lambda p, x: vit_lib.features(p, cfg.vision, x))
            t2 = timeit(feat2, vparams, pix, iters=4)
        finally:
            attn_ops.attend = real_attend
        print(f"tower features (attn=identity): {t2*1e3:7.1f} ms "
              f"(attention cost: {(t-t2)*1e3:.1f} ms / "
              f"{(t-t2)*1e3/23:.2f} ms/layer)", flush=True)
        return

    # numeric check vs xla (bf16 tolerance)
    ref = np.asarray(xla(q, k, v)[:, :valid]).astype(np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: enc_ops.encoder_attention(
        q, k, v, valid_len=vl))(q, k, v)[:, :valid]).astype(np.float32)
    err = np.abs(ref - got).max()
    print(f"max |xla - encoder_attention| = {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
