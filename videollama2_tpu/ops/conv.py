"""Convolution wrappers with torch-exact semantics on channels-last layouts.

The STC connector's hot op is a strided Conv3d (reference projector.py:164-174)
plus RegNet 1x1/depthwise-3x3 2D convs. XLA's conv_general_dilated maps these
onto the MXU; we fix NHWC/NDHWC layouts (TPU-native) and symmetric padding to
match torch's nn.Conv3d/nn.Conv2d numerics.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def _tup(x, n):
    return tuple(x) if isinstance(x, (tuple, list)) else (x,) * n


def conv2d(x: jax.Array, kernel: jax.Array, bias=None,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0,
           groups: int = 1) -> jax.Array:
    """x: [N, H, W, C_in]; kernel: [kh, kw, C_in/groups, C_out]."""
    stride = _tup(stride, 2)
    pad = _tup(padding, 2)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d(x: jax.Array, kernel: jax.Array, bias=None,
           stride: Union[int, Sequence[int]] = 1,
           padding: Union[int, Sequence[int]] = 0) -> jax.Array:
    """x: [N, T, H, W, C_in]; kernel: [kt, kh, kw, C_in, C_out]."""
    stride = _tup(stride, 3)
    pad = _tup(padding, 3)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride,
        padding=[(p, p) for p in pad],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def avg_pool3d(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """torch nn.AvgPool3d(window) with stride=window, no padding.
    x: [N, T, H, W, C]."""
    w = tuple(window)
    dims = (1, *w, 1)
    out = jax.lax.reduce_window(
        x, 0.0 if x.dtype == jnp.float32 else jnp.zeros((), x.dtype),
        jax.lax.add, window_dimensions=dims, window_strides=dims,
        padding="VALID")
    return out / float(w[0] * w[1] * w[2])
