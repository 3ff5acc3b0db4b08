"""Attention dispatch: XLA reference implementations + Pallas fast paths.

Replaces flash-attn 2.5.8, which the reference forces on both the vision
towers (videollama2/model/encoder.py:24,96) and the LLM (train.py:574,
model/__init__.py:73-74). `attend` carries STRUCTURED mask info (causal flag,
per-batch valid lengths, sliding window) rather than a materialized mask so
the Pallas kernel can exploit block sparsity; the XLA path materializes the
same mask and produces identical results up to fp tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large finite negative; avoids NaN from (-inf) - (-inf)


def mha_xla(q: jax.Array, k: jax.Array, v: jax.Array,
            mask: Optional[jax.Array] = None,
            scale: Optional[float] = None) -> jax.Array:
    """Reference multi-head attention with an explicit mask.

    q: [B, Sq, Hq, D]; k/v: [B, Sk, Hkv, D]; mask broadcastable to
    [B, Hq, Sq, Sk] (True = attend). fp32 softmax accumulation.

    GQA is computed with the query-group dimension folded into the einsum
    (no `repeat_kv` materialization — on the bandwidth-bound decode step the
    KV cache is read once, not `group` times).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    qg = q.reshape(B, Sq, Hkv, rep, D)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        # mask comes in as [B, {1|Hq}, Sq, Sk]
        if mask.shape[1] == 1:
            m = mask[:, :, None]
        else:
            m = mask.reshape(B, Hkv, rep, Sq, -1)
        logits = jnp.where(m, logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhrqk,bkhd->bqhrd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def make_prefill_mask(valid_len: jax.Array, seq_len: int,
                      sliding_window: Optional[int] = None) -> jax.Array:
    """Causal + right-padding mask for prefill: [B, 1, S, S] boolean."""
    qi = jnp.arange(seq_len)[:, None]
    ki = jnp.arange(seq_len)[None, :]
    m = qi >= ki
    if sliding_window is not None:
        m = m & (qi - ki < sliding_window)
    key_valid = ki[None, :, :] < valid_len[:, None, None]  # [B, 1, S]
    return (m[None] & key_valid)[:, None]


def attend_xla(q, k, v, valid_len=None, causal: bool = True,
               window: Optional[int] = None,
               scale: Optional[float] = None) -> jax.Array:
    """Structured-mask attention, XLA path."""
    B, Sq = q.shape[0], q.shape[1]
    Sk = k.shape[1]
    mask = None
    if causal or valid_len is not None or window is not None:
        qi = jnp.arange(Sq)[:, None]
        ki = jnp.arange(Sk)[None, :]
        m = jnp.ones((Sq, Sk), bool)
        if causal:
            m = m & (qi >= ki)
        if window is not None:
            m = m & (qi - ki < window)
        mask = jnp.broadcast_to(m[None, None], (B, 1, Sq, Sk))
        if valid_len is not None:
            mask = mask & (ki[None, None] < valid_len[:, None, None, None])
    return mha_xla(q, k, v, mask=mask, scale=scale)


def attend(q, k, v, valid_len=None, causal: bool = True,
           window: Optional[int] = None, scale: Optional[float] = None,
           impl: str = "auto") -> jax.Array:
    """Attention entry point used by all full-sequence forwards.

    impl: 'auto' (Pallas on TPU when shapes allow) | 'xla' | 'pallas'.
    Sliding-window currently routes to XLA (Mistral v0.2+ disables SW).
    """
    if impl == "auto":
        # Non-causal with unaligned S (577/729 patches) stays on XLA —
        # per-call pad/unpad x23 layers measured slower than XLA. The ViT
        # instead pre-pads its token dim ONCE (models/vit._pad_tokens) to a
        # 16-sublane multiple, and the kernel path wins: whole-sequence
        # blocks skip XLA's materialized [S, S] fp32 probs (9.5 vs 19
        # ms/layer for 128 CLIP-L frames, scripts/profile_vit_attn.py).
        impl = "pallas" if (_on_tpu() and window is None
                            and q.shape[-1] % 64 == 0
                            and q.shape[1] >= 128
                            and (causal or q.shape[1] % 16 == 0)) else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention_vjp
        if scale is None:
            scale = q.shape[-1] ** -0.5
        Sq, Sk = q.shape[1], k.shape[1]
        if (not causal and Sq == Sk and Sq <= 1024 and Sq % 16 == 0
                and q.shape[2] == k.shape[2]):
            # encoder towers: whole-sequence cells, no online softmax,
            # column mask computed once per cell (ops/encoder_attention)
            from .encoder_attention import encoder_attention_vjp
            return encoder_attention_vjp(q, k, v, valid_len, scale)
        pad_q = (-Sq) % 128
        pad_k = (-Sk) % 128
        if pad_q or pad_k:  # e.g. ViT's 577/729 patch tokens
            vl = valid_len if valid_len is not None else \
                jnp.full((q.shape[0],), Sk, jnp.int32)
            q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
            out = flash_attention_vjp(q, k, v, vl, causal, scale)
            return out[:, :Sq]
        return flash_attention_vjp(q, k, v, valid_len, causal, scale)
    return attend_xla(q, k, v, valid_len=valid_len, causal=causal,
                      window=window, scale=scale)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False
