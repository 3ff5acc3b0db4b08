"""Layer-indexed Pallas decode attention over the stacked KV cache.

The decode scan used to pass cache.k/v ([L, B, M, Hkv, hd]) as scanned
inputs, which XLA stages through per-layer HBM copies (read + write + read
of ~67 MB/layer at 7B/B=8/M=2k). Here the stacked cache stays in HBM; the
kernel receives the layer index by scalar prefetch and streams blocks of
layer li through VMEM with the Mosaic grid pipeline, computing
online-softmax GQA attention in fp32. The NEW token's k/v arrive as
separate inputs and seed the accumulators, so the cache write (one
dynamic_update_slice after the layer scan) never races the kernel.

Grid layout: (B, M/bm). The cache arrives with its [Hkv, hd] axes already
merged (models/llm.KVCache stores [L, B, M, Hkv*hd] natively — reshaping
here instead makes XLA materialize a full-cache relayout every decode
step, measured at +7 ms/token), so each grid step DMAs a [bm, Hkv*hd]
block whose rows are fully contiguous (2 KB at 7B) — maximum HBM burst
efficiency. The per-kv-head math runs in an unrolled in-kernel
loop: q arrives pre-split as [Hkv, G, hd] (leading-dim indexing only) and
the key/value blocks are lane-sliced at hd-aligned (= 128-lane-aligned)
boundaries, which Mosaic resolves to whole vector registers. Two rejected
layouts, for the record: kv-head as a grid dim with a [bm, hd] block
strided across the merged lane axis reads only 256 contiguous bytes per
row (135 GB/s, 16 ms/token at 7B); slicing q's head groups from a [H, hd]
block at sublane offset G=4 crashes the Mosaic layout pass (offset not
tile-aligned).

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
            *rest, scale: float, block_m: int,
            prompt_len: int, window: Optional[int], kv_heads: int,
            group: int, head_dim: int, quantized: bool):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    mi = pl.program_id(1)
    K, G, hd = kv_heads, group, head_dim
    wp = meta_ref[1]                       # cache row of the current token
    valid = valid_ref[b]

    @pl.when(mi == 0)
    def _seed():
        # the current token attends to itself: seed the online-softmax
        # state with the new k/v (they are not in the cache yet)
        for k in range(K):
            q_k = q_ref[0, k].astype(jnp.float32)              # [G, hd]
            kn = kn_ref[0, k].astype(jnp.float32)              # [1, hd]
            vn = vn_ref[0, k].astype(jnp.float32)
            s_new = jnp.sum(q_k * kn, axis=-1, keepdims=True) * scale
            m_ref[k] = s_new                                   # [G, 1]
            l_ref[k] = jnp.ones((G, 1), jnp.float32)
            acc_ref[k] = jnp.broadcast_to(vn, (G, hd))

    col = mi * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_m), 1)                    # [1, bm]
    keep = (col < valid) | ((col >= prompt_len) & (col < wp))
    if window is not None:
        q_pos = valid + (wp - prompt_len)              # logical query pos
        logical_k = jnp.where(col < prompt_len, col,
                              valid + (col - prompt_len))
        keep = keep & (q_pos - logical_k < window)

    # dots run in the cache's native dtype (bf16 on the MXU with fp32
    # accumulation via preferred_element_type) — converting the [bm, K*hd]
    # blocks to fp32 on the VPU costs more than the dots themselves; the
    # softmax state stays fp32. scale is applied post-dot in fp32.
    #
    # int8 cache (quantized=True): the block is int8 (HALF the HBM reads of
    # bf16 — decode attention is pure bandwidth) and per-row scales arrive
    # as [K, bm] f32 blocks whose LANES run along cache rows, so the
    # row-scale lands post-dot on the [G, bm] score tile (k side) and
    # pre-dot on the [G, bm] probability tile (v side) — both as plain
    # lane-aligned broadcasts, never touching the [bm, hd] data blocks.
    # int8 -> bf16 is exact (every int8 value is representable), so the
    # math matches the XLA dequant reference up to dot accumulation order.
    k_blk = ck_ref[0, 0]                               # [bm, K*hd]
    v_blk = cv_ref[0, 0]
    if quantized:
        ks_blk = ks_ref[0, 0]                          # [K, bm] f32
        vs_blk = vs_ref[0, 0]
    for k in range(K):
        q_k = q_ref[0, k]                              # [G, hd]
        kb = k_blk[:, k * hd:(k + 1) * hd]             # [bm, hd] lane slice
        vb = v_blk[:, k * hd:(k + 1) * hd]
        if quantized:
            kb = kb.astype(q_k.dtype)
            vb = vb.astype(q_k.dtype)
        s = jax.lax.dot_general(
            q_k, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [G, bm]
        if quantized:
            # per-row k scale: [1, bm] broadcast over the G query heads
            # (applied before masking — scales are strictly positive, and
            # scaling NEG_INF afterwards would corrupt the mask value)
            s = s * ks_blk[k:k + 1, :]
        s = jnp.where(keep, s, NEG_INF)
        # every intermediate stays 2-D ([G, 1] / [G, bm]): 1-D [G] values
        # force sublane<->lane relayouts that measured ~as much VPU time
        # as the dots themselves
        m_prev = m_ref[k]                              # [G, 1]
        m_new = jnp.maximum(m_prev,
                            jnp.max(s, axis=-1, keepdims=True))
        m_ref[k] = m_new
        alpha = jnp.exp(m_prev - m_new)                # [G, 1]
        p = jnp.exp(s - m_new)                         # [G, bm]
        l_ref[k] = l_ref[k] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            # fold the per-row v scale into p (f32) before the cast: the
            # int8 v block then feeds the MXU unscaled
            p_in = (p * vs_blk[k:k + 1, :]).astype(vb.dtype)
        else:
            p_in = p.astype(vb.dtype)
        pv = jax.lax.dot_general(
            p_in, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, hd]
        acc_ref[k] = acc_ref[k] * alpha + pv

    @pl.when(mi == pl.num_programs(1) - 1)
    def _emit():
        for k in range(K):
            o_ref[0, k] = (acc_ref[k] / l_ref[k]).astype(o_ref.dtype)


def decode_attention_layered(q: jax.Array, k_new: jax.Array,
                             v_new: jax.Array, cache_k: jax.Array,
                             cache_v: jax.Array, layer: jax.Array,
                             valid_len: jax.Array, write_pos: jax.Array,
                             prompt_len: int,
                             window: Optional[int] = None,
                             block_m: Optional[int] = None,
                             interpret: Optional[bool] = None,
                             k_scale: Optional[jax.Array] = None,
                             v_scale: Optional[jax.Array] = None
                             ) -> jax.Array:
    """Single-token GQA attention against layer `layer` of a stacked cache.

    q: [B, H, hd]; k_new/v_new: [B, Hkv, hd] (current token, pre-cache);
    cache_k/v: [L, B, M, Hkv*hd] (the merged models/llm.KVCache layout —
    merging at this call site instead costs a full-cache relayout per
    step); valid_len: [B] prompt lengths; write_pos: scalar — cache row
    the current token will occupy (kernel reads only rows < write_pos);
    prompt_len: static prompt bucket.

    int8 KV cache: pass int8 cache_k/v plus k_scale/v_scale
    [L, B, Hkv, M] f32 (models/llm.KVCache quantized layout — scale lanes
    run along cache rows so the [K, bm] scale block broadcasts straight
    onto the score tile). k_new/v_new must then be the DEQUANTIZED current
    row (quantize->dequantize round trip), so the seeded accumulator sees
    exactly the values a later verify pass reads back from the cache.

    Returns [B, H, hd] in q.dtype. GQA head h reads kv head h // (H/Hkv)
    (the contiguous-group layout of mha_xla / HF repeat_kv).
    """
    B, H, hd = q.shape
    K = k_new.shape[1]
    L, _, M, _ = cache_k.shape
    G = H // K
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if block_m is None:
        import os
        block_m = int(os.environ.get("DECODE_ATTN_BM", "512"))
    # bm must divide M (partial tail blocks are avoided — interpret mode
    # pads them, compiled Mosaic clamps them, and both break the col-index
    # masking) and, as the sublane dim of the merged [bm, K*hd] cache
    # block, be a multiple of 8 for the Mosaic lowering (unless bm == M).
    # Take the largest such divisor <= block_m, falling back to M itself.
    #
    # Quantized cache: the [K, bm] scale blocks put bm on the LANE axis, so
    # every block's lane offset (mi * bm) must be 128-aligned — bm must be
    # a multiple of 128 dividing M, else fall back to one whole-M block
    # (lane offset 0; edge padding covers a ragged M). Engine rounds
    # max_len to a multiple of 256 under kv_bits=8 so a pipelined block
    # always exists.
    bm = min(block_m, M)
    if quantized:
        while bm > 1 and (M % bm or bm % 128):
            bm -= 1
        if bm % 128 or M % bm:
            bm = M
    else:
        while bm > 1 and (M % bm or bm % 8):
            bm -= 1
        if bm == 1 and M > 1:
            bm = M

    kernel = functools.partial(
        _kernel, scale=hd ** -0.5, block_m=bm, prompt_len=prompt_len,
        window=window, kv_heads=K, group=G, head_dim=hd,
        quantized=quantized)

    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(write_pos, jnp.int32)])
    in_specs = [
        # q pre-split as [B, K, G, hd]: head rows kv*G..(kv+1)*G are
        # contiguous, so in-kernel access is leading-dim indexing only
        pl.BlockSpec((1, K, G, hd), lambda b, m, meta, val: (b, 0, 0, 0)),
        pl.BlockSpec((1, K, 1, hd), lambda b, m, meta, val: (b, 0, 0, 0)),
        pl.BlockSpec((1, K, 1, hd), lambda b, m, meta, val: (b, 0, 0, 0)),
        # cache as [L, B, M, K*hd]: rows fully contiguous in memory
        pl.BlockSpec((1, 1, bm, K * hd),
                     lambda b, m, meta, val: (meta[0], b, m, 0)),
        pl.BlockSpec((1, 1, bm, K * hd),
                     lambda b, m, meta, val: (meta[0], b, m, 0)),
    ]
    inputs = [meta, valid_len.astype(jnp.int32), q.reshape(B, K, G, hd),
              k_new.reshape(B, K, 1, hd), v_new.reshape(B, K, 1, hd),
              cache_k, cache_v]
    bytes_accessed = 2 * B * M * K * hd * cache_k.dtype.itemsize
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, K, bm),
                         lambda b, m, meta, val: (meta[0], b, 0, m)),
            pl.BlockSpec((1, 1, K, bm),
                         lambda b, m, meta, val: (meta[0], b, 0, m)),
        ]
        inputs += [k_scale, v_scale]
        bytes_accessed += 2 * B * M * K * k_scale.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # meta [2], valid_len [B] in SMEM
        grid=(B, M // bm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, K, G, hd),
                               lambda b, m, meta, val: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, G, hd), jnp.float32),       # acc
            pltpu.VMEM((K, G, 1), jnp.float32),        # running max
            pltpu.VMEM((K, G, 1), jnp.float32),        # running denom
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, G, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * M * hd),
            bytes_accessed=int(bytes_accessed),
            transcendentals=int(B * H * M)),
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, H, hd)
