"""Weight-only quantization: int8/int4 with per-channel scales.

Replaces bitsandbytes NF4/int8 (reference model/__init__.py:59-69,
train.py:404-423 — 4/8-bit base weights for QLoRA). TPU-native formulation:
weights stored as int8 (or int4 packed in int8 pairs) plus fp scales per
output channel; dequantization happens inside the matmul consumer, which XLA
fuses into the MXU feed, so HBM traffic drops 2-4x — the actual win on a
bandwidth-bound decode.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_int8(w: jax.Array, axis: int = -1) -> Dict[str, jax.Array]:
    """Symmetric per-channel int8. w: [..., in, out]; scales over `axis`
    complement (per output channel when axis=-2)."""
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_int8(pack: Dict[str, jax.Array], dtype=jnp.bfloat16
                    ) -> jax.Array:
    return (pack["q"].astype(jnp.float32) * pack["scale"]).astype(dtype)


def quantize_int4(w: jax.Array, axis: int = -1) -> Dict[str, jax.Array]:
    """Symmetric per-channel int4, two nibbles packed per int8 along `axis`.

    FOLDED layout: byte i holds row i (low nibble) and row i + n/2 (high
    nibble) — NOT interleaved pairs. Unpacking is then two contiguous
    half-slices + concat, and the decode kernels (ops/decode_matmul q4
    paths) never reorder rows in-register: they split the activation into
    halves and take two dots against the two nibble planes.

    The low nibble is stored OFFSET-BINARY (lo + 8, in [1, 15]) while the
    high nibble stays two's-complement: byte = 16*hi + (lo + 8) then never
    wraps int8 (range [-111, 127]), so the VPU unpack needs no second
    floor for sign extension — hi = floor(b/16), lo = b - 16*hi - 8 (4 f32
    ops/byte vs 6 for the symmetric pack; decode_matmul._unpack_nibbles)."""
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
    q = jnp.moveaxis(q, axis, -1)
    n = q.shape[-1]
    assert n % 2 == 0, "int4 pack needs even dimension"
    lo = (q[..., :n // 2] + 8) & 0x0F
    hi = (q[..., n // 2:] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    packed = jnp.moveaxis(packed, -1, axis)
    return {"q4": packed, "scale": scale.astype(jnp.float32),
            "axis": jnp.int32(axis % w.ndim), "orig_dim": jnp.int32(
                w.shape[axis])}


def dequantize_int4(pack: Dict[str, jax.Array], dtype=jnp.bfloat16
                    ) -> jax.Array:
    axis = int(pack["axis"])
    q = jnp.moveaxis(pack["q4"], axis, -1)
    lo = ((q & 0x0F) - 8).astype(jnp.int8)  # offset-binary low nibble
    hi = q >> 4                          # arithmetic shift sign-extends high
    full = jnp.concatenate([lo, hi], axis=-1)   # folded halves
    full = jnp.moveaxis(full, -1, axis)
    return (full.astype(jnp.float32) * pack["scale"]).astype(dtype)


def dequantize_int4_in(q4: jax.Array, scale: jax.Array,
                       dtype=jnp.bfloat16) -> jax.Array:
    """Unpack an int4 pack whose packed axis is -2 (the 'in' dim of
    [..., in, out] kernels — the only layout quantize_llm_params emits).
    jit-safe: no data-dependent axis lookup, so it works inside scanned
    layer bodies (ops/layers.dense kernel_q4 branch)."""
    q = jnp.moveaxis(q4, -2, -1)
    lo = ((q & 0x0F) - 8).astype(jnp.int8)  # offset-binary low nibble
    hi = q >> 4
    full = jnp.concatenate([lo, hi], axis=-1)   # folded halves
    full = jnp.moveaxis(full, -1, -2)
    return (full.astype(jnp.float32) * scale).astype(dtype)


def quantize_llm_params(llm_params: Dict, bits: int = 8,
                        include_head: bool = True,
                        include_embed: bool = False) -> Dict:
    """Quantize the big stacked-layer kernels; norms stay fp.

    Coverage vs the reference: the reference loads through HF transformers'
    bitsandbytes integration (model/__init__.py:59-69), which EXCLUDES
    lm_head by default (get_keys_to_not_convert keeps the output projection
    in compute dtype). include_head=True therefore quantizes MORE than the
    reference — a deliberate HBM/latency delta (−0.2 ms/tok, −262 MB at 7B;
    documented in PARITY.md and measured by scripts/quant_accuracy.py); pass
    include_head=False for strict reference parity. nn.Embedding is never
    BnB-wrapped — include_embed off by default (embed int8 is an extra HBM
    lever for 150k-vocab models; rows are gathered then row-scaled, see
    models/llm.embed_tokens). int4 packs store only
    {q4, scale} (packed axis is always -2) so the tree scans uniformly
    over the layer dim; lm_head/embed always use int8 (they are gather/
    single-matmul consumers, not the folded-nibble decode kernels)."""
    assert bits in (4, 8)
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        if name not in layers:
            continue
        entry = dict(layers[name])
        w = entry["kernel"]
        if bits == 8:
            entry["kernel_q8"] = quantize_int8(w, axis=-2)
        else:
            pack = quantize_int4(w, axis=-2)
            entry["kernel_q4"] = {"q4": pack["q4"], "scale": pack["scale"]}
        del entry["kernel"]
        layers[name] = entry
    out["layers"] = layers
    if include_head and "lm_head" in out:
        head = dict(out["lm_head"])
        head["kernel_q8"] = quantize_int8(head.pop("kernel"), axis=-2)
        out["lm_head"] = head
    if include_embed:
        emb = dict(out["embed"])
        emb["weight_q8"] = quantize_int8(emb.pop("weight"), axis=-1)
        out["embed"] = emb
    return out


def quantize_vision_params(vit_params: Dict) -> Dict:
    """int8 weight-only for the FROZEN vision tower's stacked linears
    (q/k/v/o/fc1/fc2; patch conv, norms and embeddings stay fp).

    Parity note: the reference's load_8bit wraps the WHOLE model with
    bitsandbytes — every nn.Linear in the CLIP/SigLIP tower included
    (model/__init__.py:59-69) — so an int8 tower is the same serving
    configuration, not an extra approximation. On v5e the W8A8 prefill
    context then runs the tower's GEMMs on the s8xs8->s32 MXU path
    (222 vs 158 TF/s measured at shape, ops/layers.dense_w8a8)."""
    out = dict(vit_params)
    layers = dict(vit_params["layers"])
    for name in ("q", "k", "v", "o", "fc1", "fc2"):
        if name not in layers or "kernel" not in layers[name]:
            continue
        entry = dict(layers[name])
        entry["kernel_q8"] = quantize_int8(entry.pop("kernel"), axis=-2)
        layers[name] = entry
    out["layers"] = layers
    return out


@jax.jit
def _fuse_concats(groups: Dict) -> Dict:
    return {k: jnp.concatenate(v, axis=-1) for k, v in groups.items()}


def fuse_qkv(llm_params: Dict) -> Dict:
    """Fuse the quantized q/k/v projection packs into one `qkv` entry.

    The decode hot path then issues ONE layer-indexed Pallas matmul over the
    concatenated [L, D, (H + 2*Hkv) * hd] pack instead of three (one kernel
    launch and one activation feed per layer instead of three), and prefill
    computes the fused product and splits columns. Concatenation is along
    the OUTPUT axis, so both int8 ([L, D, Dout]) and folded int4
    ([L, D/2, Dout]) layouts fuse unchanged; per-output-channel scales and
    qkv biases concatenate alongside. No-op (returns the input) when any of
    q/k/v is unquantized or carries unmerged LoRA adapters (per-projection
    deltas need the split layout). Single-chip serving only: TP sharding
    rules address q/k/v separately — apply before shard-free Engine use.
    """
    layers = llm_params.get("layers", {})
    names = ("q", "k", "v")
    kind = None
    for k in ("kernel_q8", "kernel_q4"):
        if all(k in layers.get(n, {}) for n in names):
            kind = k
    if kind is None or any("lora" in layers.get(n, {}) for n in names):
        return llm_params
    packs = [layers[n][kind] for n in names]
    qkey = "q" if kind == "kernel_q8" else "q4"
    groups = {qkey: [p[qkey] for p in packs],
              "scale": [p["scale"] for p in packs]}
    if all(layers[n].get("bias") is not None for n in names):
        groups["bias"] = [layers[n]["bias"] for n in names]
    # ONE jitted dispatch for all concats: each eager concatenate is an RPC
    # round trip on tunnel backends and this runs inside engine build
    # (engine._prepare_single_chip keeps total build dispatches <=3)
    fused_all = _fuse_concats(groups)
    fused = {kind: {qkey: fused_all[qkey], "scale": fused_all["scale"]}}
    if "bias" in fused_all:
        fused["bias"] = fused_all["bias"]
    out = dict(llm_params)
    new_layers = {n: e for n, e in layers.items() if n not in names}
    new_layers["qkv"] = fused
    out["layers"] = new_layers
    return out


def materialize_quantized(llm_params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Dequantize-in-graph: returns a param view whose kernels are rebuilt
    from int8/int4 inside jit (XLA fuses the dequant into the consumer)."""
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for name, entry in layers.items():
        if not isinstance(entry, dict):
            continue
        if "kernel_q8" in entry:
            e = dict(entry)
            e["kernel"] = dequantize_int8(e.pop("kernel_q8"), dtype)
            layers[name] = e
        elif "kernel_q4" in entry:
            e = dict(entry)
            pack = e.pop("kernel_q4")
            e["kernel"] = dequantize_int4_in(pack["q4"], pack["scale"],
                                             dtype)
            layers[name] = e
    out["layers"] = layers
    return out
