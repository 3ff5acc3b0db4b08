"""Core neural-net primitives shared across models.

Numerics follow the HF torch implementations the reference builds on
(RMSNorm/RoPE per MistralModel; activations per CLIP/SigLIP) so that the
checkpoint converter yields token-parity. All normalization math runs in
float32 regardless of the compute dtype.
"""

from __future__ import annotations

import math
import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    """torch F.gelu(approximate='tanh') — SigLIP's gelu_pytorch_tanh."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """torch nn.GELU() default (erf-based) — STC readout MLP (projector.py:128)."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "quick_gelu": quick_gelu,
    "gelu_pytorch_tanh": gelu_tanh,
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 statistics (HF MistralRMSNorm semantics:
    hidden cast to fp32, normalized, cast back, then scaled)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * scale.astype(dtype)).astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    """Standard LayerNorm over the last axis, fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (HF Llama/Mistral "rotate_half" layout)
# ---------------------------------------------------------------------------

def rope_table(positions: jax.Array, head_dim: int, theta: float,
               dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given integer positions.

    positions: [...]; returns cos,sin of shape [..., head_dim].
    Matches HF: inv_freq over even indices, concat(freqs, freqs).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array,
               sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Apply RoPE. q/k: [B, S, H, hd]; cos/sin: [B, S, hd] (broadcast over H)."""
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    q2 = q * cos + _rotate_half(q) * sin
    k2 = k * cos + _rotate_half(k) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


# ---------------------------------------------------------------------------
# Dense layers (params are dicts so trees stay uniform)
# ---------------------------------------------------------------------------

def dense(x: jax.Array, p: dict) -> jax.Array:
    """y = x @ kernel (+ bias) (+ LoRA delta). kernel: [in, out].

    Accepts int8 weight-only packs ("kernel_q8": {"q", "scale"}) and
    dequantizes in-graph — inside a scanned layer body only one layer's bf16
    weights are ever materialized, so HBM holds the int8 copy (the
    bitsandbytes-parity serving configuration, ops/quant.py).

    A "lora" entry ({"a": [in, r], "b": [r, out], "s": [1, 1]}) adds the
    low-rank delta x@A@B*s per matmul — peft LoRA semantics
    (reference train.py:465-481) without ever materializing the full-rank
    delta; with kernel_q8 this is the QLoRA configuration (frozen int8 base
    + trainable bf16 adapters, reference train.py:404-423).
    """
    if "kernel" in p:
        y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    elif "kernel_q4" in p:
        pack = p["kernel_q4"]
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if ((_on_tpu() or _force_native_enabled())
                and ((rows <= 64 and _quant_inference_enabled())
                     or _w8a8_large_rows_enabled())):
            # W4A8: nibbles unpack LOSSLESSLY to int8 (values in [-7, 7],
            # per-output-channel scale unchanged), so the serving prefill
            # rides the same s8xs8 MXU path as int8 packs — the int8
            # scratch copy is half the bytes of the bf16 dequant it
            # replaces and the dot is the faster s8 form (222 vs 146 TF/s
            # at prefill shapes, docs/DESIGN.md)
            y = dense_w4a8(x, pack)
        else:
            from .quant import dequantize_int4_in
            w = dequantize_int4_in(pack["q4"], pack["scale"], x.dtype)
            y = jnp.einsum("...i,io->...o", x, w)
    else:
        pack = p["kernel_q8"]
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if ((_on_tpu() or _force_native_enabled())
                and ((rows <= 64 and _quant_inference_enabled())
                     or _w8a8_large_rows_enabled())):
            y = dense_w8a8(x, pack)
        else:
            # training (grads must flow through the frozen base — the
            # activation round() in W8A8 would zero them) and CPU paths:
            # dequantize, scale applies on output
            y = jnp.einsum("...i,io->...o", x, pack["q"].astype(x.dtype))
            y = y * pack["scale"][..., 0, :].astype(x.dtype)
    if "lora" in p:
        lo = p["lora"]
        xa = jnp.einsum("...i,ir->...r", x, lo["a"].astype(x.dtype))
        y = y + jnp.einsum("...r,ro->...o", xa, lo["b"].astype(x.dtype)) \
            * lo["s"].astype(x.dtype)[..., 0, :]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


# Per-THREAD flags: the serving stack traces engine programs from multiple
# threads (ThreadingHTTPServer handlers, DynamicBatcher's collector thread);
# with a module global, one thread's context __exit__ could flip the flag
# mid-trace of another thread's program and silently cache a mixed-path
# executable. Trace-time is caller-thread-time (the contexts wrap INSIDE the
# jitted body, engine._get_prefill), so thread-local state is exact.
_QUANT_FLAGS = threading.local()


def _w8a8_large_rows_enabled() -> bool:
    return getattr(_QUANT_FLAGS, "w8a8_large_rows", False)


def _quant_inference_enabled() -> bool:
    return getattr(_QUANT_FLAGS, "quant_inference", False)


def _force_native_enabled() -> bool:
    return getattr(_QUANT_FLAGS, "force_native_quant", False)


@contextmanager
def force_native_quant(enabled: bool = True):
    """Measurement/CI override: take the W8A8/W4A8 s8-dot paths even when
    the backend is not a TPU. The activation-quantize + s8xs8->s32 einsum
    is backend-portable (only its SPEED is TPU-specific), so the
    quant-accuracy harness uses this to measure the numerics the TPU
    actually serves instead of silently measuring the dequant path
    (which is bit-different: it never rounds activations)."""
    prev = _force_native_enabled()
    _QUANT_FLAGS.force_native_quant = enabled
    try:
        yield
    finally:
        _QUANT_FLAGS.force_native_quant = prev


@contextmanager
def quant_inference(enabled: bool = True):
    """Trace-time gate for the SMALL-ROW (decode-shaped) W8A8/W4A8 path.

    The activation round() in dense_w8a8/dense_w4a8 has zero gradient, so a
    training forward that reached those kernels would silently zero dgrad
    through the frozen quantized base (small-batch QLoRA at B*S <= 64 used
    to hit the old row-count heuristic unconditionally). dense() now takes
    the rows<=64 fast path only inside this context; the Engine wraps all
    its inference jits (prefill/decode/verify) in it, while training traces
    stay on the dequantize path whose gradient is exact. The large-row
    `w8a8_prefill` context remains its own (inference-only) switch."""
    prev = _quant_inference_enabled()
    _QUANT_FLAGS.quant_inference = enabled
    try:
        yield
    finally:
        _QUANT_FLAGS.quant_inference = prev


@contextmanager
def w8a8_prefill(enabled: bool = True):
    """Trace-time switch: inside this context, dense() routes LARGE-row
    int8-pack matmuls (prefill) through the native s8xs8->s32 MXU dot
    (222 vs 146 TF/s measured at 16k x 4k x 4k on v5e) instead of
    dequantize-then-bf16. Inference-only: the per-row activation round()
    has zero gradient, so training keeps the dequant path. Mirrors
    bitsandbytes LLM.int8(), which also computes int8 GEMMs when the
    reference loads with load_8bit (model/__init__.py:59-69)."""
    prev = _w8a8_large_rows_enabled()
    _QUANT_FLAGS.w8a8_large_rows = enabled
    try:
        yield
    finally:
        _QUANT_FLAGS.w8a8_large_rows = prev


def dense_w8a8(x: jax.Array, pack: dict) -> jax.Array:
    """Decode-path W8A8 matmul.

    XLA cannot fuse int8->bf16 weight converts into the dot (it materializes
    a full bf16 weight copy per step — 5x HBM traffic, measured), but it DOES
    emit native s8xs8->s32 MXU dots. Quantize the activations per-row on the
    fly; only the int8 weight bytes stream from HBM.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("...i,io->...o", xq, pack["q"],
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs
            * pack["scale"][..., 0, :]).astype(x.dtype)


def dense_w4a8(x: jax.Array, pack: dict) -> jax.Array:
    """W4A8 matmul: folded-nibble int4 pack -> int8 planes -> s8xs8 dot.

    The folded pack stores byte i = (row i low nibble, offset-binary) |
    (row i + n/2 high nibble, two's-complement) << 4 (ops/quant
    .quantize_int4). Both nibbles recover EXACTLY as int8 — hi =
    arithmetic-shift >> 4 (the low nibble is always positive, so the
    floor never crosses a boundary), lo = (b & 0xF) - 8 — and the
    per-output-channel scale is shared, so the weight side loses nothing;
    the activation side uses the same per-row 8-bit quantization as
    dense_w8a8 (the approximation W8A8 serving already accepts).
    """
    q = pack["q4"]
    lo = ((q & 0x0F) - 8).astype(jnp.int8)
    hi = (q >> 4).astype(jnp.int8)
    wq = jnp.concatenate([lo, hi], axis=-2)   # folded halves: rows i, i+n/2
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("...i,io->...o", xq, wq,
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs
            * pack["scale"][..., 0, :]).astype(x.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def init_dense(rng, d_in: int, d_out: int, use_bias: bool = True,
               dtype=jnp.float32, scale: Optional[float] = None) -> dict:
    if scale is None:
        scale = 1.0 / math.sqrt(d_in)
    k = jax.random.uniform(rng, (d_in, d_out), dtype, -scale, scale)
    p = {"kernel": k}
    if use_bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p
