"""Pallas fused int8-weight matmul for the bandwidth-bound decode step.

XLA does not fuse the int8->bf16 convert into the dot: it materializes a
full bf16 copy of each weight matrix per decode step, inflating HBM traffic
5x (measured 38 ms/tok at B=8 where the int8 bytes alone should take ~9 ms).
This kernel streams weight blocks HBM->VMEM as int8 and converts in-register
feeding the MXU, so each step reads exactly the quantized bytes.

Used by ops/layers.dense for small-row inputs (decode); prefill keeps the
XLA path (compute-bound at ~160 TF/s, the bf16 copy amortizes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[:]                                   # [R, D] bf16
    w = q_ref[:].astype(x.dtype)                   # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def matmul_q8(x: jax.Array, q: jax.Array, scale: jax.Array,
              block_f: int = 512,
              interpret: Optional[bool] = None) -> jax.Array:
    """x: [R, D] float; q: [D, F] int8; scale: [F] or [1, F] fp32.

    Returns [R, F] in x.dtype. R is padded to the sublane tile internally.
    """
    R, D = x.shape
    F = q.shape[1]
    if scale.ndim == 1:
        scale = scale[None, :]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bf = min(block_f, F)
    while F % bf:
        bf //= 2
    rpad = (-R) % 16  # bf16 sublane tile
    if rpad:
        x = jnp.pad(x, ((0, rpad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(F // bf,),
        in_specs=[
            pl.BlockSpec((x.shape[0], D), lambda f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bf), lambda f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda f: (0, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bf), lambda f: (0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], F), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * x.shape[0] * D * F),
            bytes_accessed=int(D * F + x.size * 2 + x.shape[0] * F * 2),
            transcendentals=0),
        interpret=interpret,
    )(x, q, scale)
    return out[:R] if rpad else out
