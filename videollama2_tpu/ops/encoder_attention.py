"""Pallas TPU attention specialized for encoder towers (non-causal).

The ViT shapes (S=577/729 padded to 640/768, head_dim 64, 16 heads,
batch*frames up to 128) make the generic flash kernel overhead-bound rather
than MXU-bound: a (batch, head) grid is 2048 tiny cells, and per-cell
dispatch plus per-cell masking of the [S, S] score matrix rivals the matmul
time. This kernel amortizes both:

  * **Multi-head cells**: each grid cell owns `heads_per_cell` heads of one
    batch row and loops over them in-register (grid B x H/hp), cutting
    per-cell overhead by hp.
  * **Shared additive mask**: the pad mask depends only on the key column,
    so it is materialized ONCE per cell as a [1, S] additive bias row and
    fused into the score matrix with a single broadcast add — not
    iota/compare/where per head.
  * Whole-sequence blocks: S <= 1024 fits VMEM, so there is no online
    softmax — one max/exp/sum per head, fp32 on the VPU, bf16 on the MXU.

(A variant that folded the mask into the MXU contraction via an augmented
bias column measured SLOWER — 13.0 vs 9.5 ms at CLIP-L/128f shapes — the
65-wide contraction forces Mosaic relayouts that outweigh the saved VPU
mask; scripts/profile_vit_attn.py. Kept 64-wide + in-kernel masking.)

Used by the frozen CLIP/SigLIP towers (models/vit.py) via ops.attention's
`attend(..., causal=False)` dispatch; parity vs the XLA path is pinned by
tests/test_flash_attention.py. Reference parity target: flash-attn 2.5.8 as
forced by videollama2/model/encoder.py:24,96.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
            heads_per_cell: int, ablate: str = ""):
    """q/k/v/o: [1, hp, S, D]; valid_ref: [B] in SMEM (scalar prefetch).

    `ablate` drops numbered stages for perf attribution ONLY
    (scripts/profile_vit_attn.py) — never set in production."""
    S = q_ref.shape[2]
    valid = valid_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    bias = jnp.where(col < valid, 0.0, NEG)              # [1, S] once/cell
    for h in range(heads_per_cell):
        # dots in the input dtype (bf16 -> native MXU rate) with fp32
        # accumulation; scale applies to the fp32 scores and fuses with
        # the bias add. k arrives PRE-TRANSPOSED as [D, S] so both dots
        # are the natural [M,K]x[K,N] form — contracting the lane dim of
        # both operands instead makes Mosaic transpose k in VMEM per cell
        # (measured ~3 us/cell, the bulk of the kernel's 4.3 us)
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [S, S]
        if "mask" not in ablate:
            s = s * scale + bias
        if "max" not in ablate:
            m = jnp.max(s, axis=1, keepdims=True)
        else:
            m = jnp.zeros((S, 1), jnp.float32)
        if "exp" not in ablate:
            p = jnp.exp(s - m)
        else:
            p = s
        if "sum" not in ablate:
            l = jnp.sum(p, axis=1, keepdims=True)
        else:
            l = jnp.ones((S, 1), jnp.float32)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [S, D]
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _kernel_packed(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Two hd=64 heads per cell, packed into one 128-lane MXU pass each way.

    q_ref/o_ref: [1, 1, S, 2D] (pair's head dims concatenated on lanes);
    k_ref: [1, 1, 2, D, S] pre-transposed; v_ref: [1, 1, 2, S, D].

    The un-packed kernel's dots run ~20 TF/s because hd=64 half-fills the
    MXU contraction (QK) / output lanes (PV) AND each cell issues 2*hp tiny
    dots whose fixed cost rivals their FLOPs (docs/DESIGN.md ABLATE table).
    Packing a head PAIR block-diagonally trades 2x dot FLOPs for full
    128-lane utilization and exactly TWO large dots per cell:

        [S, 2D] @ [[k0  0 ]     -> scores for both heads side by side
                   [ 0  k1]]       ([S, 2S]; zero blocks kill cross terms)
        [p0 | p1] @ [[v0  0 ]   -> both heads' outputs on 128 lanes
                    [ 0  v1]]      ([S, 2D])

    Softmax stays per-head on clean 128-multiple lane slices of the packed
    score matrix. The l-normalization folds into one lane-concatenated
    multiply so the packed output is stored whole (no [S, 64] sub-tile
    stores).
    """
    S = q_ref.shape[2]
    D = q_ref.shape[3] // 2
    valid = valid_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    bias = jnp.where(col < valid, 0.0, NEG)              # [1, S] once/cell

    k0 = k_ref[0, 0, 0]                                  # [D, S]
    k1 = k_ref[0, 0, 1]
    zk = jnp.zeros((D, S), k0.dtype)
    kbd = jnp.concatenate([
        jnp.concatenate([k0, zk], axis=1),
        jnp.concatenate([zk, k1], axis=1)], axis=0)      # [2D, 2S]
    s_all = jax.lax.dot_general(
        q_ref[0, 0], kbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [S, 2S]

    ps, ls = [], []
    for h in range(2):
        s = s_all[:, h * S:(h + 1) * S] * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        ls.append(jnp.sum(p, axis=1, keepdims=True))     # [S, 1]
        ps.append(p)
    p_all = jnp.concatenate(ps, axis=1).astype(v_ref.dtype)  # [S, 2S]

    v0 = v_ref[0, 0, 0]                                  # [S, D]
    v1 = v_ref[0, 0, 1]
    zv = jnp.zeros((S, D), v0.dtype)
    vbd = jnp.concatenate([
        jnp.concatenate([v0, zv], axis=1),
        jnp.concatenate([zv, v1], axis=1)], axis=0)      # [2S, 2D]
    o = jax.lax.dot_general(
        p_all, vbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [S, 2D]
    linv = jnp.concatenate(
        [jnp.broadcast_to(1.0 / l, (S, D)) for l in ls], axis=1)
    o_ref[0, 0] = (o * linv).astype(o_ref.dtype)


def _encoder_attention_packed(qt, kt, vt, valid_len, scale, interpret):
    """qt/vt: [B, H, S, D]; kt: [B, H, D, S]. Returns [B, H, S, D]."""
    B, H, S, D = qt.shape
    Hp = H // 2
    # pair layout: q as [B, Hp, S, 2D] (lane-concat), k/v split per head
    qp = qt.reshape(B, Hp, 2, S, D).transpose(0, 1, 3, 2, 4) \
           .reshape(B, Hp, S, 2 * D)
    kp = kt.reshape(B, Hp, 2, D, S)
    vp = vt.reshape(B, Hp, 2, S, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hp),
        in_specs=[
            pl.BlockSpec((1, 1, S, 2 * D), lambda b, h, _: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 2, D, S), lambda b, h, _: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, S, D), lambda b, h, _: (b, h, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, S, 2 * D),
                               lambda b, h, _: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_packed, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, S, 2 * D), qt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * B * H * S * S * D),  # 2x packed
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * S * S),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qp, kp, vp)
    return out.reshape(B, Hp, S, 2, D).transpose(0, 1, 3, 2, 4) \
              .reshape(B, H, S, D)


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      valid_len: Optional[jax.Array] = None,
                      scale: Optional[float] = None,
                      heads_per_cell: int = 4,
                      interpret: Optional[bool] = None,
                      ablate: str = "",
                      pack_pairs: Optional[bool] = None) -> jax.Array:
    """Non-causal attention, q/k/v: [B, S, H, D] with S % 128 == 0.

    valid_len: [B] number of real (non-pad) keys per batch row, or None.
    Returns [B, S, H, D]; rows past valid_len compute garbage (callers
    slice them off, models/vit._pad_tokens).

    pack_pairs: use the block-diagonal head-pair kernel (full 128-lane MXU
    passes). MEASURED SLOWER on v5e than the multi-head-cell kernel
    (10.14 vs 8.81 ms at CLIP-L/128f, scripts/profile_vit_attn.py): the 2x
    padded-dot FLOPs outweigh the lane-fill gain, so the per-cell dots are
    not the bottleneck (per-cell overhead already amortized by hp=4).
    Default off; kept selectable for future Mosaic generations.
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    if interpret is None:  # CPU tests exercise the kernel via interpreter
        interpret = jax.devices()[0].platform != "tpu"
    if pack_pairs is None:
        pack_pairs = False
    hp = heads_per_cell
    while H % hp:
        hp //= 2
    if valid_len is None:
        valid_len = jnp.full((B,), S, jnp.int32)

    qt = q.transpose(0, 2, 1, 3)                          # [B, H, S, D]
    kt = k.transpose(0, 2, 3, 1)                          # [B, H, D, S]
    vt = v.transpose(0, 2, 1, 3)

    if pack_pairs:
        out = _encoder_attention_packed(qt, kt, vt, valid_len, scale,
                                        interpret)
        return out.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # valid_len [B] lands in SMEM pre-kernel
        grid=(B, H // hp),
        in_specs=[
            pl.BlockSpec((1, hp, S, D), lambda b, h, _: (b, h, 0, 0)),
            pl.BlockSpec((1, hp, D, S), lambda b, h, _: (b, h, 0, 0)),
            pl.BlockSpec((1, hp, S, D), lambda b, h, _: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, S, D), lambda b, h, _: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads_per_cell=hp,
                          ablate=ablate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * S * S * D),
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * S * S),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


# Differentiable wrapper: forward = Pallas, backward = XLA reference (the
# towers are frozen in every reference recipe, so the backward is cold).
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def encoder_attention_vjp(q, k, v, valid_len, scale):
    return encoder_attention(q, k, v, valid_len, scale)


def _fwd(q, k, v, valid_len, scale):
    return encoder_attention(q, k, v, valid_len, scale), (q, k, v, valid_len)


def _bwd(scale, res, g):
    from .attention import attend_xla
    q, k, v, valid_len = res

    def ref(q, k, v):
        return attend_xla(q, k, v, valid_len=valid_len, causal=False,
                          scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


encoder_attention_vjp.defvjp(_fwd, _bwd)
