"""Layer-indexed Pallas decode attention over the stacked KV cache.

The decode scan used to pass cache.k/v ([L, B, M, Hkv, hd]) as scanned
inputs, which XLA stages through per-layer HBM copies (read + write + read
of ~67 MB/layer at 7B/B=8/M=2k). Here the stacked cache stays in HBM; the
kernel receives the layer index by scalar prefetch and streams blocks of
layer li through VMEM with the Mosaic grid pipeline, computing
online-softmax GQA attention in fp32. The NEW token's k/v arrive as
separate inputs and seed the accumulators, so the cache write (a
dynamic_update_slice on the scan carry) can happen after the kernel
without an ordering hazard.

Grid layout: (B, Hkv, M/bm) — the kv-head axis is a GRID dim, so each
step's cache block is [bm, 1, hd] (one head's contiguous-in-hd rows) and
no in-kernel sublane relayout is needed (slicing the middle head dim of a
[bm, K, hd] block measured 5.1 ms/layer in VPU shuffles; this layout runs
the same math two orders of magnitude faster).

Replaces flash-attn's single-query decode path (reference forces
flash_attention_2 on the LLM, videollama2/model/__init__.py:73-74).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(meta_ref, valid_ref, q_ref, kn_ref, vn_ref, ck_ref, cv_ref,
            o_ref, acc_ref, m_ref, l_ref, *, scale: float, block_m: int,
            prompt_len: int, window: Optional[int], group: int,
            head_dim: int):
    b = pl.program_id(0)
    mi = pl.program_id(2)
    G, hd = group, head_dim
    wp = meta_ref[1]                       # cache row of the current token
    valid = valid_ref[b]

    q_h = q_ref[0, 0].astype(jnp.float32) * scale      # [G, hd]

    @pl.when(mi == 0)
    def _seed():
        # the current token attends to itself: seed the online-softmax
        # state with the new k/v (they are not in the cache yet)
        kn = kn_ref[0, 0, 0].astype(jnp.float32)       # [hd]
        vn = vn_ref[0, 0, 0].astype(jnp.float32)
        s_new = jnp.sum(q_h * kn[None, :], axis=-1)    # [G]
        m_ref[:, 0] = s_new
        l_ref[:, 0] = jnp.ones_like(s_new)
        acc_ref[:] = jnp.broadcast_to(vn[None, :], (G, hd))

    col = mi * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_m), 1)                    # [1, bm]
    keep = (col < valid) | ((col >= prompt_len) & (col < wp))
    if window is not None:
        q_pos = valid + (wp - prompt_len)              # logical query pos
        logical_k = jnp.where(col < prompt_len, col,
                              valid + (col - prompt_len))
        keep = keep & (q_pos - logical_k < window)

    k_blk = ck_ref[0, 0, :, 0, :].astype(jnp.float32)  # [bm, hd]
    v_blk = cv_ref[0, 0, :, 0, :].astype(jnp.float32)
    s = jax.lax.dot_general(
        q_h, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [G, bm]
    s = jnp.where(keep, s, NEG_INF)

    m_prev = m_ref[:, 0]                               # [G]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    m_ref[:, 0] = m_new
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])                    # [G, bm]
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [G, hd]
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv

    @pl.when(mi == pl.num_programs(2) - 1)
    def _emit():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)


def decode_attention_layered(q: jax.Array, k_new: jax.Array,
                             v_new: jax.Array, cache_k: jax.Array,
                             cache_v: jax.Array, layer: jax.Array,
                             valid_len: jax.Array, write_pos: jax.Array,
                             prompt_len: int,
                             window: Optional[int] = None,
                             block_m: int = 1024,
                             interpret: Optional[bool] = None) -> jax.Array:
    """Single-token GQA attention against layer `layer` of a stacked cache.

    q: [B, H, hd]; k_new/v_new: [B, Hkv, hd] (current token, pre-cache);
    cache_k/v: [L, B, M, Hkv, hd]; valid_len: [B] prompt lengths;
    write_pos: scalar — cache row the current token will occupy (kernel
    reads only rows < write_pos); prompt_len: static prompt bucket.
    Returns [B, H, hd] in q.dtype. GQA head h reads kv head h // (H/Hkv)
    (the contiguous-group layout of mha_xla / HF repeat_kv).
    """
    B, H, hd = q.shape
    L, _, M, K, _ = cache_k.shape
    G = H // K
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    # bm is a block OUTER dim (tiling constraints apply to trailing dims),
    # so any divisor of M works: take the largest <= block_m. Partial tail
    # blocks are avoided — interpret mode pads them, compiled Mosaic clamps
    # them, and both break the col-index masking.
    bm = min(block_m, M)
    while M % bm:
        bm -= 1

    kernel = functools.partial(
        _kernel, scale=hd ** -0.5, block_m=bm, prompt_len=prompt_len,
        window=window, group=G, head_dim=hd)

    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(write_pos, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # meta [2], valid_len [B] in SMEM
        grid=(B, K, M // bm),
        in_specs=[
            # q as [B, K, G, hd]: head rows kv*G..(kv+1)*G are contiguous
            pl.BlockSpec((1, 1, G, hd),
                         lambda b, kv, m, meta, val: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd),
                         lambda b, kv, m, meta, val: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd),
                         lambda b, kv, m, meta, val: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, bm, 1, hd),
                         lambda b, kv, m, meta, val: (meta[0], b, m, kv, 0)),
            pl.BlockSpec((1, 1, bm, 1, hd),
                         lambda b, kv, m, meta, val: (meta[0], b, m, kv, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, hd),
                               lambda b, kv, m, meta, val: (b, kv, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, hd), jnp.float32),          # acc
            pltpu.VMEM((G, 1), jnp.float32),           # running max
            pltpu.VMEM((G, 1), jnp.float32),           # running denom
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, G, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * M * hd),
            bytes_accessed=int(2 * B * M * K * hd * cache_k.dtype.itemsize),
            transcendentals=int(B * H * M)),
        interpret=interpret,
    )(meta, valid_len.astype(jnp.int32), q.reshape(B, K, G, hd),
      k_new.reshape(B, K, 1, hd), v_new.reshape(B, K, 1, hd),
      cache_k, cache_v)
    return out.reshape(B, H, hd)
