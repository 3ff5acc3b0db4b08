"""Pallas layer-indexed int8 matmuls for the bandwidth-bound decode step.

The decode loop iterates layers with `lax.scan` over weight tensors STACKED
on a leading L axis. XLA stages each scanned slice through a fresh HBM
buffer (read + write + read = 3x the weight bytes) and adds dequant
temporaries — measured 35-44 ms/token at 7B/B=8 where the int8 bytes alone
cost ~9 ms (docs/DESIGN.md perf table). These kernels instead keep the
stacked weights in HBM and pass the *layer index* via scalar prefetch: the
Mosaic pipeline DMAs exactly layer li's blocks into VMEM (double-buffered
across grid steps) and converts int8->bf16 in-register feeding the MXU, so
each decode step reads each weight byte exactly once.

Replaces the reference's HF decode loop + bitsandbytes int8 CUDA kernels
(reference videollama2/model/__init__.py:59-69) on the serving path.

Weight pack layout (ops/quant.quantize_llm_params):
  q:     [L, Din, Dout] int8
  scale: [L, 1, Dout]   fp32 (per-output-channel, symmetric)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pad_rows(x: jax.Array, mult: int = 16):
    """Pad the row dim up to the bf16 sublane tile."""
    r = x.shape[0]
    pad = (-r) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, r


def _pick_block(total: int, target: int) -> int:
    b = min(target, total)
    while total % b:
        b //= 2
    return max(b, 128 if total % 128 == 0 else 1)


# ---------------------------------------------------------------------------
# Generic layered matmul: out = x @ dequant(q[li])
# ---------------------------------------------------------------------------

def _mm_kernel(li_ref, x_ref, q_ref, s_ref, o_ref):
    del li_ref  # consumed by the index maps
    x = x_ref[:]                                    # [R, Din]
    w = q_ref[0].astype(x.dtype)                    # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def matmul_q8_layered(x: jax.Array, q: jax.Array, scale: jax.Array,
                      layer: jax.Array, block_out: int = 512,
                      interpret: Optional[bool] = None) -> jax.Array:
    """x: [R, Din]; q: [L, Din, Dout] int8; scale: [L, 1, Dout]; layer: scalar.

    Returns [R, Dout] in x.dtype. The stacked q stays in HBM; only layer
    `layer`'s blocks are DMA'd (pipelined by the grid).
    """
    L, Din, Dout = q.shape
    if interpret is None:
        interpret = _interpret_default()
    bo = _pick_block(Dout, block_out)
    x, R = _pad_rows(x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                       # layer index in SMEM
        grid=(Dout // bo,),
        in_specs=[
            pl.BlockSpec((x.shape[0], Din), lambda f, li: (0, 0)),
            pl.BlockSpec((1, Din, bo), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bo), lambda f, li: (li[0], 0, f)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bo), lambda f, li: (0, f)),
    )
    out = pl.pallas_call(
        _mm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], Dout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * x.shape[0] * Din * Dout),
            bytes_accessed=int(Din * Dout + x.size * 2 + x.shape[0] * Dout * 2),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, q, scale)
    return out[:R]


# ---------------------------------------------------------------------------
# int4 layered matmul: folded-halves nibble planes (ops/quant.quantize_int4)
# ---------------------------------------------------------------------------

def _unpack_nibbles(p, dtype):
    """Folded int4 byte plane -> (lo, hi) sign-extended values in `dtype`.

    Shift-free AND int32-free: Mosaic cannot legalize vector shifts on
    int8 (arith.shli), and int32 arithmetic runs at 1/4 vector width. All
    byte values are exactly representable in bf16/f32 (|p| <= 127 < 2^8
    mantissa bits), so the nibbles come out via float floor-division at
    full VPU width. byte = 16*hi + (lo + 8) — the low nibble is stored
    offset-binary (ops/quant.quantize_int4), so its sign extension is a
    constant subtract instead of a second floor chain: 4 f32 ops/byte."""
    # f32 ALU throughout: v5e has no bf16 vector ALU (floor/compare fail
    # to legalize), and int32 runs at 1/4 width
    pf = p.astype(jnp.float32)
    hi = jnp.floor(pf * 0.0625)                    # arithmetic >> 4
    lo = pf - hi * 16.0 - 8.0                      # offset-binary low nibble
    return lo.astype(dtype), hi.astype(dtype)


def _mm4_kernel(li_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref):
    del li_ref
    xlo = xlo_ref[:]                                # [R, Din/2]
    xhi = xhi_ref[:]
    lo, hi = _unpack_nibbles(q_ref[0], xlo.dtype)   # [Din/2, bo]
    acc = jax.lax.dot_general(xlo, lo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xhi, hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def matmul_q4_layered(x: jax.Array, q4: jax.Array, scale: jax.Array,
                      layer: jax.Array, block_out: int = 512,
                      interpret: Optional[bool] = None) -> jax.Array:
    """x: [R, Din]; q4: [L, Din/2, Dout] folded int4; scale: [L, 1, Dout].

    Returns [R, Dout] in x.dtype. The folded pack means byte row i carries
    weight rows i (lo nibble) and i + Din/2 (hi): the kernel contracts the
    activation HALVES against the sign-extended nibble planes — no
    in-register row reorder, and each decode step reads exactly the int4
    bytes (half the q8 stream)."""
    L, Dh, Dout = q4.shape
    if interpret is None:
        interpret = _interpret_default()
    bo = _pick_block(Dout, block_out)
    x, R = _pad_rows(x)
    xlo, xhi = x[:, :Dh], x[:, Dh:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Dout // bo,),
        in_specs=[
            pl.BlockSpec((x.shape[0], Dh), lambda f, li: (0, 0)),
            pl.BlockSpec((x.shape[0], Dh), lambda f, li: (0, 0)),
            pl.BlockSpec((1, Dh, bo), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bo), lambda f, li: (li[0], 0, f)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bo), lambda f, li: (0, f)),
    )
    out = pl.pallas_call(
        _mm4_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], Dout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * x.shape[0] * Dh * Dout),
            bytes_accessed=int(Dh * Dout + x.size * 2
                               + x.shape[0] * Dout * 2),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xlo, xhi, q4, scale)
    return out[:R]


# ---------------------------------------------------------------------------
# Fused SwiGLU FFN: out = (silu(x@G) * (x@U)) @ D, all weights layer-indexed
# ---------------------------------------------------------------------------

def _accumulate_and_emit(f, part, acc_ref, o_ref, ds_ref):
    """Branchless grid-accumulation epilogue shared by the FFN kernels.

    `jnp.where` instead of `@pl.when` closures: per-trace closures defeat
    JAX's cond tracing cache (re-traced every retrace, and with
    jax_explain_cache_misses on they spam a warning per closure per trace).
    At f == 0 the scratch read is uninitialized garbage, but the select
    discards that lane-wise, and the output block is grid-invariant (index
    map (0, 0)) so the unconditional o_ref store is a VMEM-resident write
    whose last value wins — no extra HBM traffic.
    """
    acc = jnp.where(f == 0, part, acc_ref[:] + part)
    acc_ref[:] = acc
    o_ref[:] = (acc * ds_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_kernel(li_ref, x_ref, g_ref, gs_ref, u_ref, us_ref, d_ref, ds_ref,
                o_ref, acc_ref):
    del li_ref
    f = pl.program_id(0)
    x = x_ref[:]                                    # [R, D]
    g = jax.lax.dot_general(x, g_ref[0].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g * gs_ref[0].astype(jnp.float32)           # [R, bf]
    u = jax.lax.dot_general(x, u_ref[0].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u * us_ref[0].astype(jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)        # [R, bf]
    part = jax.lax.dot_general(h, d_ref[0].astype(x.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    _accumulate_and_emit(f, part, acc_ref, o_ref, ds_ref)


def _ffn4_kernel(li_ref, xlo_ref, xhi_ref, gl_ref, gls_ref, gh_ref, ghs_ref,
                 ul_ref, uls_ref, uh_ref, uhs_ref, d_ref, ds_ref,
                 o_ref, acc_ref):
    del li_ref
    f = pl.program_id(0)
    xlo = xlo_ref[:]
    xhi = xhi_ref[:]

    def mm4(p):
        lo, hi = _unpack_nibbles(p, xlo.dtype)
        acc = jax.lax.dot_general(xlo, lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return acc + jax.lax.dot_general(xhi, hi, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    def swiglu(g, gs, u, us):
        g = g * gs.astype(jnp.float32)
        u = u * us.astype(jnp.float32)
        return (jax.nn.silu(g) * u).astype(xlo.dtype)

    # two F-column ranges per step: the down pack pairs rows (i, i + F/2)
    h_lo = swiglu(mm4(gl_ref[0]), gls_ref[0], mm4(ul_ref[0]), uls_ref[0])
    h_hi = swiglu(mm4(gh_ref[0]), ghs_ref[0], mm4(uh_ref[0]), uhs_ref[0])
    dlo, dhi = _unpack_nibbles(d_ref[0], xlo.dtype)  # [bfh, D] packed over F
    part = jax.lax.dot_general(h_lo, dlo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    part += jax.lax.dot_general(h_hi, dhi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    _accumulate_and_emit(f, part, acc_ref, o_ref, ds_ref)


def ffn_q4_layered(x: jax.Array, gate_q: jax.Array, gate_s: jax.Array,
                   up_q: jax.Array, up_s: jax.Array,
                   down_q: jax.Array, down_s: jax.Array,
                   layer: jax.Array, block_f: int = 256,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Fused SwiGLU FFN over layer-indexed FOLDED int4 weights.

    x: [R, D]; gate_q/up_q: [L, D/2, F] int4 (packed over D); down_q:
    [L, F/2, D] int4 (packed over F); *_s: [L, 1, .] fp32 scales. Each grid
    step processes the PAIRED F-column ranges [f*bf, (f+1)*bf) and the same
    + F/2, because the folded down pack stores those h columns in one byte
    plane — so gate/up arrive twice per step under two index maps.
    """
    L, Dh, F = gate_q.shape
    if interpret is None:
        interpret = _interpret_default()
    Fh = F // 2
    bf = _pick_block(Fh, block_f)
    nb = Fh // bf
    x, R = _pad_rows(x)
    Rp = x.shape[0]
    D = Dh * 2
    xlo, xhi = x[:, :Dh], x[:, Dh:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Rp, Dh), lambda f, li: (0, 0)),
            pl.BlockSpec((Rp, Dh), lambda f, li: (0, 0)),
            pl.BlockSpec((1, Dh, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, Dh, bf),
                         lambda f, li, _nb=nb: (li[0], 0, f + _nb)),
            pl.BlockSpec((1, 1, bf),
                         lambda f, li, _nb=nb: (li[0], 0, f + _nb)),
            pl.BlockSpec((1, Dh, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, Dh, bf),
                         lambda f, li, _nb=nb: (li[0], 0, f + _nb)),
            pl.BlockSpec((1, 1, bf),
                         lambda f, li, _nb=nb: (li[0], 0, f + _nb)),
            pl.BlockSpec((1, bf, D), lambda f, li: (li[0], f, 0)),
            pl.BlockSpec((1, 1, D), lambda f, li: (li[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((Rp, D), lambda f, li: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Rp, D), jnp.float32)],
    )
    out = pl.pallas_call(
        _ffn4_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * Rp * D * F * 3),
            bytes_accessed=int(3 * Dh * F + Rp * D * 4),
            transcendentals=int(Rp * F)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xlo, xhi,
      gate_q, gate_s, gate_q, gate_s, up_q, up_s, up_q, up_s,
      down_q, down_s)
    return out[:R]


def ffn_q8_layered(x: jax.Array, gate_q: jax.Array, gate_s: jax.Array,
                   up_q: jax.Array, up_s: jax.Array,
                   down_q: jax.Array, down_s: jax.Array,
                   layer: jax.Array, block_f: int = 256,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Fused SwiGLU FFN over layer-indexed int8 weights.

    x: [R, D]; gate_q/up_q: [L, D, F] int8; down_q: [L, F, D] int8;
    *_s: matching [L, 1, .] fp32 scales; layer: scalar int32.
    Returns [R, D] in x.dtype. One kernel streams gate+up+down blocks of the
    selected layer (3 * D * block_f int8 bytes per grid step, pipelined).
    """
    L, D, F = gate_q.shape
    if interpret is None:
        interpret = _interpret_default()
    bf = _pick_block(F, block_f)
    x, R = _pad_rows(x)
    Rp = x.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F // bf,),
        in_specs=[
            pl.BlockSpec((Rp, D), lambda f, li: (0, 0)),
            pl.BlockSpec((1, D, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, D, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, 1, bf), lambda f, li: (li[0], 0, f)),
            pl.BlockSpec((1, bf, D), lambda f, li: (li[0], f, 0)),
            pl.BlockSpec((1, 1, D), lambda f, li: (li[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((Rp, D), lambda f, li: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Rp, D), jnp.float32)],
    )
    out = pl.pallas_call(
        _ffn_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * Rp * D * F * 3),
            bytes_accessed=int(3 * D * F + Rp * D * 4),
            transcendentals=int(Rp * F)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x,
      gate_q, gate_s, up_q, up_s, down_q, down_s)
    return out[:R]
