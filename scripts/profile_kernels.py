"""Microbenchmark decode-path kernels on the real TPU.

Isolates: host->device dispatch overhead (tunnel), single layered-matmul
bandwidth, fused-FFN bandwidth, and the full decode chunk — so regressions
attribute to the right stage. Run: python scripts/profile_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """Force a device->host readback: on the axon remote tunnel,
    block_until_ready returns without waiting for execution (measured
    127 TB/s 'bandwidth' with it), so only fetching bytes is a real sync."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, iters=8):
    """Enqueue iters chained calls with distinct inputs, sync once at the
    end: time = iters * device_exec + one RTT. Distinct inputs guard against
    any result caching; bf16 needs deltas that survive rounding."""
    import jax.numpy as jnp

    x0 = args[0]
    xs = [x0 + jnp.asarray((i + 1) * 0.125, x0.dtype)
          for i in range(iters + 1)]
    _sync(fn(xs[-1], *args[1:]))
    t0 = time.time()
    outs = [fn(xs[i], *args[1:]) for i in range(iters)]
    _sync(outs[-1])
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print("platform:", dev.platform, flush=True)

    # 0. dispatch overhead: trivial op
    x0 = jnp.zeros((8, 8), jnp.float32)
    f0 = jax.jit(lambda a: a + 1)
    dt = timeit(f0, x0, iters=16)
    print(f"null dispatch: {dt*1e3:.2f} ms", flush=True)

    L, D, F = 32, 4096, 14336
    B = 8
    Hhd, Khd = 4096, 1024

    from videollama2_tpu.ops import decode_matmul as dk

    x = jnp.full((B, D), 0.01, jnp.bfloat16)
    key = {}
    for name, (din, dout) in dict(q=(D, Hhd), kv=(D, Khd),
                                  o=(Hhd, D)).items():
        key[name] = (jnp.ones((L, din, dout), jnp.int8),
                     jnp.full((L, 1, dout), 1e-4, jnp.float32))
    gate = (jnp.ones((L, D, F), jnp.int8), jnp.full((L, 1, F), 1e-4))
    down = (jnp.ones((L, F, D), jnp.int8), jnp.full((L, 1, D), 1e-4))

    li = jnp.int32(3)

    for bo in (256, 512, 1024):
        f = jax.jit(lambda x, q, s, li: dk.matmul_q8_layered(
            x, q, s, li, block_out=bo))
        dt = timeit(f, x, *key["q"], li)
        gb = D * Hhd / dt / 1e9
        print(f"matmul q [4096x4096] block {bo}: {dt*1e6:.0f} us "
              f"{gb:.0f} GB/s", flush=True)

    for bf in (128, 256, 512):
        f = jax.jit(lambda x, g, gs, u, us, d, ds, li: dk.ffn_q8_layered(
            x, g, gs, u, us, d, ds, li, block_f=bf))
        dt = timeit(f, x, *gate, *gate, *down, li)
        gb = 3 * D * F / dt / 1e9
        print(f"ffn [3x 4096x14336] block {bf}: {dt*1e6:.0f} us "
              f"{gb:.0f} GB/s", flush=True)

    # one full q8 layer-set of matmuls, back to back (weights as jit ARGS —
    # captured-constant weights are catastrophically slow on this runtime)
    def layer_mms(x, li, key, gate, down):
        q = dk.matmul_q8_layered(x, *key["q"], li)
        k = dk.matmul_q8_layered(x, *key["kv"], li)
        v = dk.matmul_q8_layered(x, *key["kv"], li)
        o = dk.matmul_q8_layered(q, *key["o"], li)
        f = dk.ffn_q8_layered(x + o, *gate, *gate, *down, li)
        return f + k.sum() + v.sum()

    f = jax.jit(layer_mms)
    dt = timeit(f, x, li, key, gate, down)
    per_layer_bytes = D * Hhd + 2 * D * Khd + Hhd * D + 3 * D * F
    print(f"one layer all matmuls: {dt*1e6:.0f} us "
          f"{per_layer_bytes/dt/1e9:.0f} GB/s", flush=True)

    # scan over 32 layers of just the matmuls (weights as jit args)
    def scan_mms(x, key, gate, down):
        def body(h, li):
            return layer_mms(h, li, key, gate, down)[:, :D], None
        h, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return h

    f = jax.jit(scan_mms)
    dt = timeit(f, x, key, gate, down, iters=4)
    print(f"scan 32 layers matmuls only: {dt*1e3:.2f} ms "
          f"({per_layer_bytes*L/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
