"""Pallas TPU flash attention (forward).

Replaces flash-attn 2.5.8, which the reference forces on the ViT towers and
the LLM (encoder.py:24,96; train.py:574). Standard blocked online-softmax
scheme tuned for the TPU memory hierarchy:

  * grid (B, H, Sq/BLOCK_Q); K/V for the (batch, head) stay resident in VMEM
    while each query block streams through the MXU;
  * fp32 running max / denominator / accumulator (VPU), bf16 matmuls (MXU);
  * causal masking prunes whole K blocks above the diagonal (the inner
    fori_loop upper bound is derived from the query block index), and
    right-padding is masked via a per-batch `valid_len` scalar in SMEM;
  * GQA is handled by expanding KV heads on the caller side view (no copy:
    the index map repeats the KV head for its query-head group).

Training uses XLA attention (jax.checkpoint remat); this kernel carries a
custom_vjp whose backward falls back to the XLA reference implementation, so
it is safe to differentiate through (at XLA-attention speed) while inference
gets the fused forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *rest,
                  scale: float,
                  causal: bool, block_q: int, block_k: int, seq_k: int,
                  kv_repeat: int, with_lse: bool = False):
    del kv_repeat
    qi = pl.program_id(2)
    q = q_ref[0, 0]                                      # [BQ, D] bf16
    valid = valid_ref[pl.program_id(0)]  # scalar-prefetch: full [B] in SMEM

    nk = seq_k // block_k
    if causal:
        # last K block that intersects the causal triangle for this Q block
        upper = jnp.minimum(nk, (qi * block_q + block_q + block_k - 1)
                            // block_k)
    else:
        upper = nk

    def body(kb, carry):
        acc, m, l = carry
        # matmuls run in the input dtype (bf16 -> native MXU rate; f32
        # operands would run the MXU at ~1/4 speed) with fp32 accumulation;
        # scale applies to the fp32 scores instead of to q
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k)]
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k)]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < valid
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    # Fully-masked rows (only possible at valid_len == 0, which no caller
    # produces): every s is NEG_INF, so m stays NEG_INF, p = exp(0) = 1 and
    # l counts visited columns — the row emits mean(v), exactly matching
    # the XLA path's softmax-of-all-NEG_INF (attention.mha_xla), and its
    # gradients are exactly zero (the backward zeroes p via the explicit
    # mask, never via exp). The l == 0 guard below is pure div-by-zero
    # safety for degenerate grids, not the masked-row path.
    out = acc / jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    if with_lse:
        # log-sum-exp per query row, consumed by the tiled backward
        # (p = exp(s - lse) reconstructs softmax rows without renormalizing).
        # Fully-masked rows land on m + log(count) = NEG_INF exactly (f32
        # absorbs the +log(n) — NEG_INF's ulp is ~1e21), so downstream
        # where(mask, exp(s - lse), 0) stays finite-by-masking.
        # Stored lane-broadcast as [.., block_q, 128]: Mosaic requires the
        # last two block dims (sublane, lane) be (8k, 128k) or whole-dim, so
        # a [B, H, S] layout with (1, 1, bq) blocks does not lower — same
        # scheme as jax.experimental.pallas.ops.tpu.flash_attention's l/m
        # outputs (MIN_BLOCK_SIZE trailing dim).
        lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
        rest[0][0, 0] = jnp.broadcast_to(lse, (block_q, 128))


def _pick_block(s: int, target: int) -> int:
    b = min(target, s)
    while s % b:
        b //= 2
    return max(b, 1)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    valid_len: Optional[jax.Array] = None,
                    causal: bool = True,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: Optional[bool] = None,
                    return_lse: bool = False):
    """q: [B, Sq, Hq, D]; k/v: [B, Sk, Hkv, D]; valid_len: [B] or None.

    Returns [B, Sq, Hq, D]. Sq/Sk must be multiples of the chosen blocks
    (callers pad to buckets, so this holds by construction).
    return_lse=True additionally returns the per-row logsumexp as
    [B, Hq, Sq, 128] f32 with the value replicated across the trailing 128
    lanes (the training path's backward residual; see _flash_kernel for why
    the lane-broadcast layout is required).
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    if interpret is None:  # CPU tests exercise the kernel via interpreter
        interpret = jax.devices()[0].platform != "tpu"
    rep = Hq // Hkv
    if not causal and Sq <= 1024 and Sk <= 1024:
        # small non-causal batches (the ViT: B*H = 2048 cells at 577-640
        # tokens): per-grid-cell overhead (~3 us on this backend) dominates
        # sliced blocks — one whole-sequence block per (b, h) measured
        # 14.7 vs 32 ms/layer for 128 CLIP-L frames. Causal keeps sliced
        # blocks for the block-pruning FLOP win.
        block_q, block_k = Sq, Sk
    bq = _pick_block(Sq, block_q)
    bk = _pick_block(Sk, block_k)
    if valid_len is None:
        valid_len = jnp.full((B,), Sk, jnp.int32)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_q=bq, block_k=bk,
        seq_k=Sk, kv_repeat=rep, with_lse=return_lse)

    out_specs = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, _: (b, h, i, 0))
    out_shape = jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, bq, 128),
                                  lambda b, h, i, _: (b, h, i, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, Hq, Sq, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # valid_len [B] lands in SMEM pre-kernel
        grid=(B, Hq, Sq // bq),
        # index maps receive the scalar-prefetch ref as a trailing arg
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, _: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Sk, D),
                         lambda b, h, i, _: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D),
                         lambda b, h, i, _: (b, h // rep, 0, 0)),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Sk * D * (0.5 if causal else 1.0)),
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * Hq * Sq * Sk),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qt, kt, vt)
    if return_lse:
        out, lse = out
        return out.transpose(0, 2, 1, 3), lse
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Tiled backward (FlashAttention-2 scheme)
#
# The reference's training hot loop is flash-attn forward AND backward
# (train.py:573-574 forcing flash_attention_2); until round 5 the backward
# here fell back to jax.vjp over the XLA reference, which materializes the
# full [B, H, Sq, Sk] probability tensor per layer — at S=2048 under full
# remat that tensor is built twice per layer per step. The tiled backward
# below never materializes more than a [bq, bk] tile:
#
#   delta_i = rowsum(do_i * o_i)                       (XLA, fused)
#   p_ij    = exp(q_i k_j^T * scale - lse_i)           (recomputed per tile)
#   dv_j   += p_ij^T do_i
#   ds_ij   = p_ij * (do_i v_j^T - delta_i) * scale
#   dq_i   += ds_ij k_j          (dq kernel: grid over q blocks)
#   dk_j   += ds_ij^T q_i        (dkv kernel: grid over k blocks)
#
# dq and dk/dv run as separate kernels so each output is written by exactly
# one grid cell (no cross-cell accumulation). The dkv kernel runs at QUERY
# head resolution (grid h over Hq, k/v index-mapped h // rep like the
# forward); the per-group sum down to Hkv heads happens outside in XLA.
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                         lse_ref, dq_ref, *, scale: float, causal: bool,
                         block_q: int, block_k: int, seq_k: int):
    qi = pl.program_id(2)
    q = q_ref[0, 0]                                     # [BQ, D]
    do = do_ref[0, 0]                                   # [BQ, D]
    lse = lse_ref[0, 0][:, :1]                          # [BQ, 1] f32
    # delta_i = rowsum(do_i * o_i), computed in-kernel from the o/do blocks
    # (cheaper than a lane-broadcast [B, H, S, 128] delta tensor in HBM)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0, 0].astype(jnp.float32),
                    axis=1, keepdims=True)              # [BQ, 1] f32
    valid = valid_ref[pl.program_id(0)]

    nk = seq_k // block_k
    if causal:
        upper = jnp.minimum(nk, (qi * block_q + block_q + block_k - 1)
                            // block_k)
    else:
        upper = nk

    def body(kb, acc):
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k)]
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k)]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < valid
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        # explicit zeroing (not exp of masked s): padded rows carry
        # lse = NEG_INF, where exp(s - lse) would blow up
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        ds = p * (dp - delta) * scale
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, D]

    d = q_ref.shape[-1]
    acc = jax.lax.fori_loop(0, upper, body,
                            jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                          lse_ref, dk_ref, dv_ref, *, scale: float,
                          causal: bool, block_q: int, block_k: int,
                          seq_q: int):
    ki = pl.program_id(2)
    k_blk = k_ref[0, 0]                                 # [BK, D]
    v_blk = v_ref[0, 0]
    valid = valid_ref[pl.program_id(0)]

    nq = seq_q // block_q
    # causal: the first q block that can see this k block
    lower = (ki * block_k) // block_q if causal else 0

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(qb * block_q, block_q)]    # [BQ, D]
        do = do_ref[0, 0, pl.ds(qb * block_q, block_q)]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, :1]  # [BQ, 1]
        o_blk = o_ref[0, 0, pl.ds(qb * block_q, block_q)]
        delta = jnp.sum(do.astype(jnp.float32) * o_blk.astype(jnp.float32),
                        axis=1, keepdims=True)           # [BQ, 1] f32
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < valid
        if causal:
            row = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BK, D]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        ds = p * (dp - delta) * scale
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BK, D]
        return dk_acc, dv_acc

    d = k_ref.shape[-1]
    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(lower, nq, body, (zeros, zeros))
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def flash_attention_bwd(q, k, v, o, lse, do, valid_len,
                        causal: bool, scale: float,
                        block_q: int = 256, block_k: int = 256,
                        interpret: Optional[bool] = None):
    """Tiled dq/dk/dv. Shapes as flash_attention; lse: [B, Hq, Sq, 128] f32
    (lane-broadcast, as returned by flash_attention(return_lse=True)).

    Returns (dq [B,Sq,Hq,D], dk [B,Sk,Hkv,D], dv [B,Sk,Hkv,D]) in the
    input dtypes. GQA: dk/dv are computed per QUERY head then group-summed.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    rep = Hq // Hkv
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bq = _pick_block(Sq, block_q)
    bk = _pick_block(Sk, block_k)
    if valid_len is None:
        valid_len = jnp.full((B,), Sk, jnp.int32)

    qt = q.transpose(0, 2, 1, 3)                        # [B, H, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    ot = o.transpose(0, 2, 1, 3)
    # delta = rowsum(do * o) is computed inside the kernels from the o/do
    # blocks already streaming through VMEM (a lane-broadcast delta tensor
    # would cost more HBM than re-reading o)

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, causal=causal, block_q=bq,
        block_k=bk, seq_k=Sk)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, Sq // bq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, _: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Sk, D),
                             lambda b, h, i, _: (b, h // rep, 0, 0)),
                pl.BlockSpec((1, 1, Sk, D),
                             lambda b, h, i, _: (b, h // rep, 0, 0)),
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, _: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, _: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 128),
                             lambda b, h, i, _: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D),
                                   lambda b, h, i, _: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(6 * B * Hq * Sq * Sk * D * (0.5 if causal else 1.0)),
            bytes_accessed=2 * (qt.size + kt.size + vt.size)
            * qt.dtype.itemsize,
            transcendentals=B * Hq * Sq * Sk),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qt, kt, vt, dot, ot, lse)

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, causal=causal, block_q=bq,
        block_k=bk, seq_q=Sq)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, Sk // bk),
            in_specs=[
                pl.BlockSpec((1, 1, Sq, D), lambda b, h, j, _: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, h, j, _: (b, h // rep, j, 0)),
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, h, j, _: (b, h // rep, j, 0)),
                pl.BlockSpec((1, 1, Sq, D), lambda b, h, j, _: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sq, D), lambda b, h, j, _: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sq, 128),
                             lambda b, h, j, _: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk, D), lambda b, h, j, _: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, j, _: (b, h, j, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, Hq, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Hq, Sk, D), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(8 * B * Hq * Sq * Sk * D * (0.5 if causal else 1.0)),
            bytes_accessed=2 * (qt.size + kt.size + vt.size)
            * qt.dtype.itemsize,
            transcendentals=B * Hq * Sq * Sk),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qt, kt, vt, dot, ot, lse)

    dq = dq.transpose(0, 2, 1, 3)
    # GQA: sum query-head grads within each kv group
    dk = dk.reshape(B, Hkv, rep, Sk, D).sum(2).transpose(0, 2, 1, 3)
    dv = dv.reshape(B, Hkv, rep, Sk, D).sum(2).transpose(0, 2, 1, 3)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# Differentiable wrapper: forward AND backward are tiled Pallas kernels.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_vjp(q, k, v, valid_len, causal, scale):
    return flash_attention(q, k, v, valid_len, causal, scale)


def _fwd(q, k, v, valid_len, causal, scale):
    out, lse = flash_attention(q, k, v, valid_len, causal, scale,
                               return_lse=True)
    # Residual-stash only one lane: the 128-lane broadcast is a Mosaic
    # OUTPUT-layout requirement, not information — keeping it as a
    # residual would hold 128x the bytes live from forward to backward
    # (134 MB/layer at 7B S=2048 B=4 without remat). _bwd re-broadcasts
    # transiently for the kernels' block shape.
    return out, (q, k, v, out, lse[..., :1], valid_len)


def _bwd(causal, scale, res, g):
    q, k, v, o, lse1, valid_len = res
    lse = jnp.broadcast_to(lse1, lse1.shape[:-1] + (128,))
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, g, valid_len,
                                     causal, scale)
    return dq, dk, dv, None


flash_attention_vjp.defvjp(_fwd, _bwd)
