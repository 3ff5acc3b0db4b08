"""Timing-equivalent synthetic weights, materialized on-device.

Real checkpoints are not downloadable in the bench environment, and weight
VALUES do not affect MXU/HBM timing — so benchmarks build constant-fill
trees instead. Two properties matter on a 16 GB chip behind a slow tunnel:

  * int8 packs are built DIRECTLY at the ShapeDtypeStruct level (a bf16 7B
    tree + its int8 packs never coexist in HBM — materializing bf16 first
    and quantizing OOMs the chip);
  * the tree is shaped host-side with jax.eval_shape and filled by ONE
    jitted program of constant fills, so nothing crosses the host->device
    link (a 7.5 GB host-built tree took 666 s through the tunnel,
    BENCH_r03).

Used by bench.py and scripts/bench_{speculative,session}.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _q8_like(entry):
    sds = jax.ShapeDtypeStruct
    w = entry["kernel"]
    return {"kernel_q8": {
        "q": sds(w.shape, jnp.int8),
        "scale": sds(w.shape[:-2] + (1, w.shape[-1]), jnp.float32)}}


def _q4_like(entry):
    # folded nibble pack: half the in-rows, layout of ops/quant.quantize_int4
    sds = jax.ShapeDtypeStruct
    w = entry["kernel"]
    return {"kernel_q4": {
        "q4": sds(w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1]), jnp.int8),
        "scale": sds(w.shape[:-2] + (1, w.shape[-1]), jnp.float32)}}


def quantized_llm_abstract(llm_abstract: dict, bits: int = 8) -> dict:
    """Rewrite an LLM eval_shape subtree to the EXACT layout
    ops/quant.quantize_llm_params emits (pinned by
    tests/test_synthetic.py): layer kernels to int8/int4 packs, lm_head
    int8 (include_head defaults True — a deliberate delta vs the
    reference's HF-BnB load, which keeps lm_head in compute dtype via
    get_keys_to_not_convert; see quantize_llm_params / PARITY.md)."""
    sds = jax.ShapeDtypeStruct
    pack = _q8_like if bits == 8 else _q4_like
    layers = dict(llm_abstract["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        entry = dict(layers[name])
        entry.update(pack(entry))
        del entry["kernel"]
        layers[name] = entry
    out = {**llm_abstract, "layers": layers}
    if "lm_head" in out and "kernel" in out["lm_head"]:
        head = dict(out["lm_head"])
        hk = head.pop("kernel")
        head["kernel_q8"] = {"q": sds(hk.shape, jnp.int8),
                             "scale": sds((1, hk.shape[-1]), jnp.float32)}
        out["lm_head"] = head
    return out


def quantized_abstract(abstract: dict, quantize_llm: bool = True,
                       quantize_vision: bool = False,
                       quantize_embed: bool = False,
                       llm_bits: int = 8) -> dict:
    """Rewrite an eval_shape param tree to its int8-pack layout."""
    sds = jax.ShapeDtypeStruct
    abstract = dict(abstract)
    if quantize_llm:
        abstract["llm"] = quantized_llm_abstract(abstract["llm"],
                                                 bits=llm_bits)
        if quantize_embed:
            # large-vocab families (Qwen2 152k): the bf16 embed alone is
            # 1.1 GB — store it int8 too (models/llm q8 gather path;
            # lm_head is already int8 via quantized_llm_abstract)
            abstract["llm"] = dict(abstract["llm"])
            ew = abstract["llm"]["embed"]["weight"]
            abstract["llm"]["embed"] = {"weight_q8": {
                "q": sds(ew.shape, jnp.int8),
                "scale": sds((ew.shape[0], 1), jnp.float32)}}
    if quantize_vision and "vision" in abstract:
        vlayers = dict(abstract["vision"]["layers"])
        for name in ("q", "k", "v", "o", "fc1", "fc2"):
            entry = dict(vlayers[name])
            entry.update(_q8_like(entry))
            del entry["kernel"]
            vlayers[name] = entry
        abstract["vision"] = {**abstract["vision"], "layers": vlayers}
    return abstract


def materialize_fills(abstract) -> dict:
    """One jitted device-side program of constant fills over the tree."""
    def _leaf(path, a):
        if a.dtype == jnp.int8:
            return jnp.ones(a.shape, a.dtype)
        is_scale = any(getattr(k, "key", None) == "scale" for k in path)
        return jnp.full(a.shape, 1e-4 if is_scale else 0.01, a.dtype)

    params = jax.jit(lambda: jax.tree_util.tree_map_with_path(
        _leaf, abstract))()
    jax.block_until_ready(params)
    return params


def synthetic_model_params(cfg, dtype=jnp.bfloat16, quantize_llm=True,
                           quantize_vision=False,
                           quantize_embed=False, llm_bits=8) -> dict:
    """eval_shape + (optional) int8/int4 layout rewrite + on-device fills."""
    from ..models import videollama2 as vl2
    abstract = jax.eval_shape(
        lambda: vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype))
    abstract = quantized_abstract(abstract, quantize_llm=quantize_llm,
                                  quantize_vision=quantize_vision,
                                  quantize_embed=quantize_embed,
                                  llm_bits=llm_bits)
    return materialize_fills(abstract)
