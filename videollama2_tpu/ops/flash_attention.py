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


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                  causal: bool, block_q: int, block_k: int, seq_k: int,
                  kv_repeat: int):
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
    # fully-masked rows (pad queries): l == 0 -> emit zeros, not NaN
    out = acc / jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = out.astype(o_ref.dtype)


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
                    interpret: Optional[bool] = None) -> jax.Array:
    """q: [B, Sq, Hq, D]; k/v: [B, Sk, Hkv, D]; valid_len: [B] or None.

    Returns [B, Sq, Hq, D]. Sq/Sk must be multiples of the chosen blocks
    (callers pad to buckets, so this holds by construction).
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
        seq_k=Sk, kv_repeat=rep)

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
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, i, _: (b, h, i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Sk * D * (0.5 if causal else 1.0)),
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * Hq * Sq * Sk),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


# Differentiable wrapper: forward = Pallas, backward = XLA reference.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_vjp(q, k, v, valid_len, causal, scale):
    return flash_attention(q, k, v, valid_len, causal, scale)


def _fwd(q, k, v, valid_len, causal, scale):
    return flash_attention(q, k, v, valid_len, causal, scale), \
        (q, k, v, valid_len)


def _bwd(causal, scale, res, g):
    from .attention import attend_xla
    q, k, v, valid_len = res

    def ref(q, k, v):
        return attend_xla(q, k, v, valid_len=valid_len, causal=causal,
                          scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_vjp.defvjp(_fwd, _bwd)
