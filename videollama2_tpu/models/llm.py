"""Unified causal decoder: Mistral / Qwen2 / Llama (dense) and Mixtral (MoE).

The reference wraps four HF model families with identical multimodal glue
(videollama2/model/videollama2_{mistral,qwen2,llama,mixtral}.py). Here one
functional, layer-stacked decoder covers all four, switched by `LLMConfig`:

  * layers are STACKED along a leading axis and iterated with `lax.scan`,
    so XLA compiles one layer body regardless of depth (fast compiles,
    trivially shardable param tree);
  * KV caches are preallocated, donated buffers written with per-sample
    dynamic slices (static shapes end-to-end — no HF-style python loop);
  * GQA attention with fp32 softmax; RoPE in the HF rotate-half layout so
    converted checkpoints are bit-compatible.

Param tree layout (kernels are [in, out], i.e. transposed torch Linear):
  embed.weight            [V, D]
  layers.attn_norm.scale  [L, D]
  layers.{q,k,v}.kernel   [L, D, H*hd]   (+ .bias for Qwen2)
  layers.o.kernel         [L, H*hd, D]
  layers.mlp_norm.scale   [L, D]
  layers.{gate,up}.kernel [L, D, F]      (MoE: [L, E, D, F])
  layers.down.kernel      [L, F, D]      (MoE: [L, E, F, D])
  layers.router.kernel    [L, D, E]      (MoE only)
  final_norm.scale        [D]
  lm_head.kernel          [D, V]         (absent when tied embeddings)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..ops import attention as attn_ops
from ..ops.layers import apply_rope, dense, rms_norm, rope_table


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache. k/v: [L, B, M, Hkv*hd].

    The kv-head and head-dim axes are stored MERGED: the decode attention
    kernel (ops/decode_attention) reads [bm, Hkv*hd] blocks whose rows are
    fully contiguous, and un-merging per head happens in-register via
    128-lane-aligned slices. Keeping the cache 5-D and reshaping at the
    kernel call instead costs a full-cache physical relayout per decode
    step (XLA's tiled layouts make merging trailing axes non-free: measured
    +7 ms/token at 7B/B=8/M=2080 — half the decode budget).

    int8 KV mode (init_cache(kv_bits=8)): k/v hold int8 rows and
    k_scale/v_scale hold per-(row, kv-head) dynamic scales, stored
    TRANSPOSED as [L, B, Hkv, M] so the Pallas decode kernel DMAs a
    [Hkv, bm] scale block whose lanes run along the cache rows. Every
    writer quantizes with the same _quantize_kv_rows (round-to-nearest-even
    symmetric int8), so plain-step, verify and prefill writes are
    bit-identical given the same values — the invariant that keeps
    speculative/session decoding token-identical to the plain loop under
    quantization. Halves the decode attention's HBM reads and the cache
    footprint (the round-5 B=16 headline lever; reference anchor: the HF
    KV loop the reference delegates to,
    videollama2/model/videollama2_mistral.py:110-144)."""
    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(cfg: LLMConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, kv_bits: int = 16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len,
             cfg.num_kv_heads * cfg.head_dim)
    if kv_bits == 8:
        sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len)
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
    assert kv_bits == 16, kv_bits
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-(row, kv-head) int8 quantization of new cache rows.

    x: [..., hd] float. Returns (q int8 [..., hd], scale f32 [...]).
    The SINGLE quantizer used by prefill, decode_step and decode_verify —
    identical rounding everywhere is what keeps speculative verification
    token-identical to plain decoding over a quantized cache."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _dequant_kv(ck: jax.Array, cs: jax.Array, dtype) -> jax.Array:
    """[B, M, Hkv*hd] int8 + [B, Hkv, M] scales -> [B, M, Hkv, hd] dtype.

    Correctness fallback, not a fast path: callers (the XLA decode_step
    body and decode_verify) rebuild the FULL dequantized cache in-graph
    every step, so kv_bits=8 WITHOUT int8 weight packs — or any
    speculative verify over a quantized cache — trades the halved cache
    reads for an extra bf16 materialize per layer. The serving defaults
    (int8/int4 weights + plain decode) never hit this: they take the
    Pallas _decode_step_q8 kernel, which dequantizes int8 blocks in VMEM.
    docs/DESIGN.md "kv8 fallback cost" records the measured envelope."""
    B, M, KH = ck.shape
    K = cs.shape[1]
    hd = KH // K
    x = ck.reshape(B, M, K, hd).astype(jnp.float32)
    return (x * cs.transpose(0, 2, 1)[..., None]).astype(dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: LLMConfig, dtype=jnp.float32) -> dict:
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, K, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(rng, 16)
    std = 0.02

    def normal(key, shape):
        # generate directly in the target dtype: fp32 transients of the
        # stacked 7B tensors would exceed HBM during init
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    layers = {
        "attn_norm": {"scale": jnp.ones((L, D), dtype)},
        "q": {"kernel": normal(keys[0], (L, D, H * hd))},
        "k": {"kernel": normal(keys[1], (L, D, K * hd))},
        "v": {"kernel": normal(keys[2], (L, D, K * hd))},
        "o": {"kernel": normal(keys[3], (L, H * hd, D))},
        "mlp_norm": {"scale": jnp.ones((L, D), dtype)},
    }
    if cfg.qkv_bias:
        layers["q"]["bias"] = jnp.zeros((L, H * hd), dtype)
        layers["k"]["bias"] = jnp.zeros((L, K * hd), dtype)
        layers["v"]["bias"] = jnp.zeros((L, K * hd), dtype)
    if cfg.is_moe:
        E = cfg.num_experts
        layers["router"] = {"kernel": normal(keys[4], (L, D, E))}
        layers["gate"] = {"kernel": normal(keys[5], (L, E, D, F))}
        layers["up"] = {"kernel": normal(keys[6], (L, E, D, F))}
        layers["down"] = {"kernel": normal(keys[7], (L, E, F, D))}
    else:
        layers["gate"] = {"kernel": normal(keys[5], (L, D, F))}
        layers["up"] = {"kernel": normal(keys[6], (L, D, F))}
        layers["down"] = {"kernel": normal(keys[7], (L, F, D))}

    params = {
        "embed": {"weight": normal(keys[8], (cfg.vocab_size, D))},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": normal(keys[9], (D, cfg.vocab_size))}
    return params


def embed_tokens(params: dict, token_ids: jax.Array,
                 dtype=None) -> jax.Array:
    emb = params["embed"]
    if "weight_q8" in emb:
        # int8 embedding (per-row scales): gather int8 rows, scale after —
        # only the looked-up rows dequantize (quant.quantize_llm_params
        # include_embed, the 150k-vocab HBM lever)
        pack = emb["weight_q8"]
        rows = jnp.take(pack["q"], token_ids, axis=0)
        scales = jnp.take(pack["scale"], token_ids, axis=0)
        out = rows.astype(jnp.float32) * scales
        return out.astype(dtype if dtype is not None else jnp.float32)
    w = emb["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    return jnp.take(w, token_ids, axis=0)


def lm_logits(params: dict, cfg: LLMConfig, hidden: jax.Array) -> jax.Array:
    """Project hidden states to vocabulary logits (fp32)."""
    if not cfg.tie_word_embeddings and "kernel_q8" in params.get(
            "lm_head", {}):
        # int8 lm_head (BnB quantizes every Linear incl. the head):
        # dense() runs W8A8 on TPU / dequant-in-graph elsewhere
        return dense(hidden, params["lm_head"]).astype(jnp.float32)
    if cfg.tie_word_embeddings:
        emb = params["embed"]
        if "weight_q8" in emb:
            # tied head over an int8 embed pack: dequant-in-graph (XLA
            # fuses the row-scale into the matmul feed)
            pack = emb["weight_q8"]
            kernel = (pack["q"].astype(jnp.float32) * pack["scale"]).T
        else:
            kernel = emb["weight"].T
    else:
        kernel = params["lm_head"]["kernel"]
    return jnp.einsum("...d,dv->...v", hidden, kernel.astype(hidden.dtype),
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Layer bodies
# ---------------------------------------------------------------------------

def _moe_router(x: jax.Array, lp: dict, cfg: LLMConfig):
    """Top-k routing (HF MixtralSparseMoeBlock): fp32 softmax over all
    experts, keep top-k, renormalize the kept weights."""
    router_logits = jnp.einsum("...d,de->...e", x.astype(jnp.float32),
                               lp["router"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(router_logits, axis=-1)           # [..., E]
    topw, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi


def _ffn_moe(x: jax.Array, lp: dict, cfg: LLMConfig) -> jax.Array:
    """Mixtral sparse-MoE FFN dispatch.

    "dense": exact HF MixtralSparseMoeBlock semantics — every expert computes
    every token, unselected experts zero-weighted (E/k times the top-k
    FLOPs; the correctness oracle). "gather": capacity-based top-k dispatch —
    only routed (token, expert) pairs compute, FLOPs ~ k/E of dense; tokens
    beyond an expert's capacity are dropped (standard MoE capacity
    semantics — a delta vs HF's exact compute that vanishes as capacity
    grows). "auto" picks gather for >=64 tokens (prefill/training), dense
    for tiny decode batches where capacity would have to be ~N anyway.
    """
    mode = cfg.moe_dispatch
    if mode == "auto":
        n_tok = x.shape[0] * x.shape[1]
        mode = "gather" if n_tok >= 64 else "dense"
    if mode == "gather":
        return _ffn_moe_gather(x, lp, cfg)
    topw, topi = _moe_router(x, lp, cfg)
    # scatter normalized top-k weights back to a dense [., E] weight tensor
    oh = jax.nn.one_hot(topi, cfg.num_experts, dtype=topw.dtype)
    weights = jnp.sum(oh * topw[..., None], axis=-2)          # [..., E]
    g = jnp.einsum("bsd,edf->bsef", x, lp["gate"]["kernel"].astype(x.dtype))
    u = jnp.einsum("bsd,edf->bsef", x, lp["up"]["kernel"].astype(x.dtype))
    h = jax.nn.silu(g) * u
    y = jnp.einsum("bsef,efd->bsed", h, lp["down"]["kernel"].astype(x.dtype))
    return jnp.einsum("bsed,bse->bsd", y, weights.astype(x.dtype))


def _ffn_moe_gather(x: jax.Array, lp: dict, cfg: LLMConfig) -> jax.Array:
    """Capacity-based top-k gather/scatter MoE (the EP-efficient dispatch).

    Tokens are packed into a [E, C, D] buffer (C = capacity per expert),
    each expert runs its FFN over its own contiguous block (one batched
    einsum on the stacked expert weights — shards on the `expert` mesh
    axis), and the outputs scatter-add back weighted by the router. FLOPs:
    E*C*D*F*3 ~ (k/E * capacity_factor) of the dense formulation.
    """
    B, S, D = x.shape
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    N = B * S
    xt = x.reshape(N, D)
    topw, topi = _moe_router(xt, lp, cfg)                  # [N, k]
    # pairs: (token, slot) flattened
    flat_e = topi.reshape(-1)                              # [N*k]
    flat_w = topw.reshape(-1)
    flat_t = jnp.repeat(jnp.arange(N), k)                  # [N*k]
    C = min(N, max(1, int(-(-N * k * cfg.moe_capacity_factor // E))))
    # rank of each pair within its expert (arrival order, HF tie behavior
    # is irrelevant because overflow only drops beyond capacity)
    oh = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)        # [N*k, E]
    pos = jnp.cumsum(oh, axis=0) * oh
    pos_in_e = jnp.max(pos, axis=1) - 1                    # [N*k]
    keep = pos_in_e < C
    slot = jnp.clip(pos_in_e, 0, C - 1)
    buf = jnp.zeros((E, C, D), x.dtype)
    contrib = jnp.where(keep[:, None], xt[flat_t], 0).astype(x.dtype)
    buf = buf.at[flat_e, slot].add(contrib, mode="drop")
    g = jnp.einsum("ecd,edf->ecf", buf, lp["gate"]["kernel"].astype(x.dtype))
    u = jnp.einsum("ecd,edf->ecf", buf, lp["up"]["kernel"].astype(x.dtype))
    h = jax.nn.silu(g) * u
    y = jnp.einsum("ecf,efd->ecd", h, lp["down"]["kernel"].astype(x.dtype))
    pair_out = y[flat_e, slot]                             # [N*k, D]
    pair_out = pair_out * (flat_w * keep).astype(x.dtype)[:, None]
    out = jnp.zeros((N, D), x.dtype).at[flat_t].add(pair_out)
    return out.reshape(B, S, D)


def _attention_block(cfg: LLMConfig, x: jax.Array, lp: dict,
                     cos: jax.Array, sin: jax.Array,
                     valid_len: jax.Array, attn_impl: str = "auto"):
    """Shared attention core. Returns (attn_out, (k, v)) with k/v pre-cache.

    Under parallel.sharding.sequence_parallel, q/k/v are re-annotated from
    seq-sharded to head-sharded (GSPMD inserts the Ulysses all-to-alls) so
    each shard attends over the FULL sequence for its head slice."""
    from ..parallel import sharding as sh
    B, S, D = x.shape
    H, K, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in lp:
        # fused serving pack (ops/quant.fuse_qkv): one matmul, split columns
        qkv = dense(x, lp["qkv"])
        q, k, v = (qkv[..., :H * hd], qkv[..., H * hd:(H + K) * hd],
                   qkv[..., (H + K) * hd:])
    else:
        q, k, v = dense(x, lp["q"]), dense(x, lp["k"]), dense(x, lp["v"])
    q = sh.sp_shard_heads(q.reshape(B, S, H, hd))
    k = sh.sp_shard_heads(k.reshape(B, S, K, hd))
    v = sh.sp_shard_heads(v.reshape(B, S, K, hd))
    q, k = apply_rope(q, k, cos, sin)
    out = attn_ops.attend(q, k, v, valid_len=valid_len, causal=True,
                          window=cfg.sliding_window, impl=attn_impl)
    out = out.reshape(B, S, H * hd)
    return sh.sp_shard_seq(dense(out, lp["o"])), (k, v)


def _layer(cfg: LLMConfig, x, lp, cos, sin, valid_len, attn_impl="auto"):
    h = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_norm_eps)
    attn_out, kv = _attention_block(cfg, h, lp, cos, sin, valid_len,
                                    attn_impl)
    x = x + attn_out
    h = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
    if cfg.is_moe:
        ffn_out = _ffn_moe(h, lp, cfg)
    else:
        g = jax.nn.silu(dense(h, lp["gate"]))
        u = dense(h, lp["up"])
        ffn_out = dense(g * u, lp["down"])
    return x + ffn_out, kv


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def forward(params: dict, cfg: LLMConfig, embeds: jax.Array,
            positions: jax.Array, valid_len: jax.Array,
            attn_impl: str = "auto", remat: bool = False,
            kv_quantize: bool = False
            ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Full-sequence forward (prefill / training).

    embeds: [B, S, D] already-spliced input embeddings.
    positions: [B, S] RoPE positions. valid_len: [B].
    Returns (hidden [B, S, D] post-final-norm, (k, v) [L, B, S, Hkv, hd]).

    kv_quantize=True (int8-KV prefill): each layer's k/v quantize INSIDE
    the scan body and the stacked outputs are (kq, ks, vq, vs) with int8
    rows — accumulating bf16 [L, B, S, Hkv, hd] stacks instead costs 2x
    the bytes and at B=16/S=1664/7B is the difference between fitting and
    OOMing a 16 GB chip (the stacks are live simultaneously with the late
    layers' FFN peaks).
    """
    from ..parallel import sharding as sh
    B, S, D = embeds.shape
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
    embeds = sh.sp_shard_seq(embeds)

    def body(x, lp):
        out, kv = _layer(cfg, x, lp, cos, sin, valid_len,
                         attn_impl=attn_impl)
        if kv_quantize:
            kq, ks = _quantize_kv_rows(kv[0])
            vq, vs = _quantize_kv_rows(kv[1])
            kv = (kq, ks, vq, vs)
        return sh.sp_shard_seq(out), kv

    if remat == "dots":
        # save matmul outputs, recompute elementwise only: ~25% faster
        # steps than full remat when activations fit (scripts/profile_train)
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat:
        body = jax.checkpoint(body)
    x, kvs = jax.lax.scan(body, embeds, params["layers"])
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    return x, kvs


def prefill(params: dict, cfg: LLMConfig, embeds: jax.Array,
            positions: jax.Array, valid_len: jax.Array, cache: KVCache,
            attn_impl: str = "auto") -> Tuple[jax.Array, KVCache]:
    """Prefill: run the prompt, fill cache[:, :, :S], return last-token hidden.

    Returns (last_hidden [B, D], cache).
    """
    hidden, kvs = forward(params, cfg, embeds, positions, valid_len,
                          attn_impl=attn_impl,
                          kv_quantize=cache.quantized)
    S = embeds.shape[1]
    L, B = kvs[0].shape[0], kvs[0].shape[1]
    if cache.quantized:
        # prompt rows quantized by the shared row quantizer INSIDE the
        # forward scan (halves the stacked-kv footprint); attention DURING
        # prefill used the exact bf16 k/v, only the stored cache rows are
        # int8 — decode then reads every prompt row dequantized
        kq, ks, vq, vs = kvs       # [L,B,S,Hkv,hd] int8, [L,B,S,Hkv] f32
        new_k = jax.lax.dynamic_update_slice(
            cache.k, kq.reshape(L, B, S, -1), (0, 0, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, vq.reshape(L, B, S, -1), (0, 0, 0, 0))
        new_ks = jax.lax.dynamic_update_slice(
            cache.k_scale, ks.transpose(0, 1, 3, 2), (0, 0, 0, 0))
        new_vs = jax.lax.dynamic_update_slice(
            cache.v_scale, vs.transpose(0, 1, 3, 2), (0, 0, 0, 0))
        cache = KVCache(new_k, new_v, new_ks, new_vs)
    else:
        k, v = kvs
        k = k.reshape(L, B, S, -1)         # merge [Hkv, hd] (cache layout)
        v = v.reshape(L, B, S, -1)
        new_k = jax.lax.dynamic_update_slice(
            cache.k, k.astype(cache.k.dtype), (0, 0, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, v.astype(cache.v.dtype), (0, 0, 0, 0))
        cache = KVCache(new_k, new_v)
    # gather hidden state of the last *valid* token per sample
    idx = jnp.clip(valid_len - 1, 0, S - 1)
    last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    return last, cache


def decode_step(params: dict, cfg: LLMConfig, token_embeds: jax.Array,
                cache: KVCache, valid_len: jax.Array, prompt_len: int,
                step: jax.Array) -> Tuple[jax.Array, KVCache]:
    """One autoregressive step for all sequences in the batch.

    TPU-first cache layout: every sample's generated tokens live at the SAME
    cache rows [prompt_len + step], regardless of per-sample prompt length
    (prompt keys occupy [0, valid_len_b); rows [valid_len_b, prompt_len) stay
    masked padding). The per-step cache write is then one aligned
    `dynamic_update_slice` — per-sample write positions lower to a scatter,
    measured at ~25 ms/token of pure overhead for a 7B on v5e. RoPE
    positions stay logical (valid_len + step), so outputs are identical to a
    contiguous layout.

    token_embeds: [B, 1, D]; valid_len: [B] true prompt lengths;
    prompt_len: static padded prompt bucket; step: scalar decode index.
    Returns (logits [B, V] fp32, updated cache).
    """
    B = token_embeds.shape[0]
    M = cache.max_len
    positions = (valid_len + step)[:, None]            # [B, 1] logical
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
    write_pos = prompt_len + step                      # shared cache row

    ki = jnp.arange(M)[None, :]
    mask = (ki < valid_len[:, None]) | \
           ((ki >= prompt_len) & (ki <= write_pos))
    if cfg.sliding_window is not None:
        logical_k = jnp.where(ki < prompt_len, ki,
                              valid_len[:, None] + (ki - prompt_len))
        mask = mask & (positions - logical_k < cfg.sliding_window)
    mask = mask[:, None, None, :]

    layers = params["layers"]
    proj = (("qkv",) if "qkv" in layers else ("q", "k", "v")) + \
        ("o", "gate", "up", "down")
    for pack, bits in (("kernel_q8", 8), ("kernel_q4", 4)):
        if not cfg.is_moe and all(
                pack in layers[n] and "lora" not in layers[n]
                for n in proj):
            # unmerged LoRA adapters fall through to the dense() path,
            # which applies them; the Pallas kernels read only the
            # quantized base
            return _decode_step_q8(params, cfg, token_embeds, cache, mask,
                                   cos, sin, write_pos, valid_len,
                                   prompt_len, bits=bits)

    quantized = cache.quantized

    def body(x, scan_in):
        if quantized:
            lp, ck, cv, cks, cvs = scan_in
        else:
            lp, ck, cv = scan_in
        h = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_norm_eps)
        H, K, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        M_ = ck.shape[1]
        if "qkv" in lp:
            qkv = dense(h, lp["qkv"])
            q, k, v = (qkv[..., :H * hd], qkv[..., H * hd:(H + K) * hd],
                       qkv[..., (H + K) * hd:])
        else:
            q, k, v = dense(h, lp["q"]), dense(h, lp["k"]), dense(h, lp["v"])
        q = q.reshape(B, 1, H, hd)
        k = k.reshape(B, 1, K, hd)
        v = v.reshape(B, 1, K, hd)
        q, k = apply_rope(q, k, cos, sin)
        if quantized:
            # write the row quantized; attention reads the cache back
            # DEQUANTIZED (incl. this token's own row — the same values a
            # later verify pass will see, keeping speculative greedy
            # token-identical)
            kq, ks = _quantize_kv_rows(k[:, 0])        # [B,K,hd], [B,K]
            vq, vs = _quantize_kv_rows(v[:, 0])
            ck = jax.lax.dynamic_update_slice(
                ck, kq.reshape(B, 1, K * hd), (0, write_pos, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq.reshape(B, 1, K * hd), (0, write_pos, 0))
            cks = jax.lax.dynamic_update_slice(
                cks, ks[:, :, None], (0, 0, write_pos))
            cvs = jax.lax.dynamic_update_slice(
                cvs, vs[:, :, None], (0, 0, write_pos))
            k_read = _dequant_kv(ck, cks, q.dtype)
            v_read = _dequant_kv(cv, cvs, q.dtype)
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k.reshape(B, 1, K * hd).astype(ck.dtype),
                (0, write_pos, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.reshape(B, 1, K * hd).astype(cv.dtype),
                (0, write_pos, 0))
            k_read = ck.reshape(B, M_, K, hd).astype(q.dtype)
            v_read = cv.reshape(B, M_, K, hd).astype(q.dtype)
        out = attn_ops.mha_xla(q, k_read, v_read, mask=mask)
        out = dense(out.reshape(B, 1, H * hd), lp["o"])
        x = x + out
        h = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
        if cfg.is_moe:
            ffn_out = _ffn_moe(h, lp, cfg)
        else:
            g = jax.nn.silu(dense(h, lp["gate"]))
            u = dense(h, lp["up"])
            ffn_out = dense(g * u, lp["down"])
        if quantized:
            return x + ffn_out, (ck, cv, cks, cvs)
        return x + ffn_out, (ck, cv)

    if quantized:
        x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            body, token_embeds, (params["layers"], cache.k, cache.v,
                                 cache.k_scale, cache.v_scale))
        new_cache = KVCache(new_k, new_v, new_ks, new_vs)
    else:
        x, (new_k, new_v) = jax.lax.scan(
            body, token_embeds, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(new_k, new_v)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    logits = lm_logits(params, cfg, x[:, 0])
    return logits, new_cache


def decode_verify(params: dict, cfg: LLMConfig, token_embeds: jax.Array,
                  cache: KVCache, valid_len: jax.Array, prompt_len: int,
                  step0: jax.Array) -> Tuple[jax.Array, KVCache]:
    """K-token speculative verify step (beyond-reference capability).

    Runs K candidate tokens (the last accepted token + K-1 drafted
    continuations) through the decoder in ONE pass: every weight matrix is
    read from HBM once for all K tokens, so accepted drafts cut the
    bandwidth floor of bandwidth-bound decode by up to K. Slot i occupies
    cache row prompt_len+step0+i with logical RoPE position
    valid_len+step0+i and attends the prompt rows [0, valid_len) plus
    generated rows [prompt_len, prompt_len+step0+i] — slot-causal over the
    draft block, so logits[:, i] equal a sequential decode_step's logits
    given the same prefix (tests/test_speculative.py pins this).

    Rows written for later-rejected slots are overwritten by the next
    call's K-row write before any attention reads them (the write covers
    [step0', step0'+K) ⊇ the stale tail, and masks never reach past the
    accepted frontier).

    step0 may be a scalar (lockstep rows: sessions, B=1 speculation) or a
    [B] array of PER-ROW decode frontiers — batched speculative decoding
    advances each row by its own acceptance count, so rows write and
    attend at independent cache offsets.

    token_embeds: [B, K, D]. Returns (logits [B, K, V] fp32, cache).
    """
    B, K, _ = token_embeds.shape
    M = cache.max_len
    offs = jnp.arange(K)
    step_arr = jnp.broadcast_to(jnp.asarray(step0, jnp.int32),
                                valid_len.shape)                # [B]
    positions = valid_len[:, None] + step_arr[:, None] \
        + offs[None, :]                                         # [B, K]
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
    write_pos = prompt_len + step_arr                           # [B]

    ki = jnp.arange(M)[None, None, :]                           # [1, 1, M]
    frontier = (write_pos[:, None] + offs[None, :])[:, :, None]  # [B, K, 1]
    mask = (ki < valid_len[:, None, None]) | \
           ((ki >= prompt_len) & (ki <= frontier))              # [B, K, M]
    if cfg.sliding_window is not None:
        logical_k = jnp.where(ki < prompt_len, ki,
                              valid_len[:, None, None] + (ki - prompt_len))
        mask = mask & (positions[:, :, None] - logical_k
                       < cfg.sliding_window)
    mask = mask[:, None]                                        # [B,1,K,M]

    H, Kh, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    quantized = cache.quantized

    def body(x, scan_in):
        if quantized:
            lp, ck, cv, cks, cvs = scan_in
        else:
            lp, ck, cv = scan_in
        h = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_norm_eps)
        M_ = ck.shape[1]
        if "qkv" in lp:
            qkv = dense(h, lp["qkv"])
            q, k, v = (qkv[..., :H * hd], qkv[..., H * hd:(H + Kh) * hd],
                       qkv[..., (H + Kh) * hd:])
        else:
            q, k, v = dense(h, lp["q"]), dense(h, lp["k"]), dense(h, lp["v"])
        q = q.reshape(B, K, H, hd)
        k = k.reshape(B, K, Kh, hd)
        v = v.reshape(B, K, Kh, hd)
        q, k = apply_rope(q, k, cos, sin)

        # per-row K-row write at each row's own frontier (vmapped DUS
        # lowers to a scatter; K*B rows, negligible at decode scale)
        def _write(c, rows, wp):
            return jax.lax.dynamic_update_slice(c, rows, (wp, 0))
        if quantized:
            # same shared quantizer as decode_step/prefill: the rows a
            # verify pass writes are bit-identical to the rows a plain
            # decode would have written, and the block's intra-draft
            # attention reads them back DEQUANTIZED (incl. each slot's own
            # row) — exactly what a sequential quantized decode sees
            kq, ksc = _quantize_kv_rows(k)             # [B,K,Kh,hd],[B,K,Kh]
            vq, vsc = _quantize_kv_rows(v)
            ck = jax.vmap(_write)(ck, kq.reshape(B, K, Kh * hd), write_pos)
            cv = jax.vmap(_write)(cv, vq.reshape(B, K, Kh * hd), write_pos)

            def _write_s(c, scs, wp):
                # scale layout [Kh, M]: K new columns land at lane wp
                return jax.lax.dynamic_update_slice(c, scs, (0, wp))
            cks = jax.vmap(_write_s)(cks, ksc.transpose(0, 2, 1), write_pos)
            cvs = jax.vmap(_write_s)(cvs, vsc.transpose(0, 2, 1), write_pos)
            k_read = _dequant_kv(ck, cks, q.dtype)
            v_read = _dequant_kv(cv, cvs, q.dtype)
        else:
            ck = jax.vmap(_write)(
                ck, k.reshape(B, K, Kh * hd).astype(ck.dtype), write_pos)
            cv = jax.vmap(_write)(
                cv, v.reshape(B, K, Kh * hd).astype(cv.dtype), write_pos)
            k_read = ck.reshape(B, M_, Kh, hd).astype(q.dtype)
            v_read = cv.reshape(B, M_, Kh, hd).astype(q.dtype)
        out = attn_ops.mha_xla(q, k_read, v_read, mask=mask)
        out = dense(out.reshape(B, K, H * hd), lp["o"])
        x = x + out
        h = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
        if cfg.is_moe:
            ffn_out = _ffn_moe(h, lp, cfg)
        else:
            g = jax.nn.silu(dense(h, lp["gate"]))
            u = dense(h, lp["up"])
            ffn_out = dense(g * u, lp["down"])
        if quantized:
            return x + ffn_out, (ck, cv, cks, cvs)
        return x + ffn_out, (ck, cv)

    if quantized:
        x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            body, token_embeds, (params["layers"], cache.k, cache.v,
                                 cache.k_scale, cache.v_scale))
        new_cache = KVCache(new_k, new_v, new_ks, new_vs)
    else:
        x, (new_k, new_v) = jax.lax.scan(
            body, token_embeds, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(new_k, new_v)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    logits = lm_logits(params, cfg, x)
    return logits, new_cache


def _decode_step_q8(params: dict, cfg: LLMConfig, token_embeds: jax.Array,
                    cache: KVCache, mask: jax.Array, cos: jax.Array,
                    sin: jax.Array, write_pos: jax.Array,
                    valid_len: jax.Array, prompt_len: int, bits: int = 8
                    ) -> Tuple[jax.Array, KVCache]:
    """Decode step over int8/int4-packed weights via layer-indexed Pallas
    matmuls (bits=4 streams half the weight bytes: the reference's
    load_4bit serving configuration at full kernel speed).

    `lax.scan` over stacked weights stages each layer's slice through a fresh
    HBM buffer (3x the weight bytes — the 35-44 ms/token floor characterized
    in docs/DESIGN.md). Here the scan iterates only the layer INDEX plus the
    small per-layer tensors (norm scales, qkv biases); the stacked int8
    kernels AND the stacked KV cache are closed over READ-ONLY and read in
    place by layer-indexed Pallas kernels (ops/decode_matmul,
    ops/decode_attention) that DMA exactly layer li's blocks HBM->VMEM.
    Each layer's new k/v row leaves the scan as a stacked output and all L
    rows are written with ONE [L, B, 1, K, hd] dynamic_update_slice after
    the scan (the attention kernel never reads row write_pos — the current
    token attends to itself through the seeded accumulators). Making the
    cache a scan CARRY instead measured 317 ms/token: XLA stages the full
    stacked cache through a fresh copy every layer.
    """
    from ..ops import decode_attention as dk_attn
    from ..ops import decode_matmul as dk

    B = token_embeds.shape[0]
    H, K, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers
    layers = params["layers"]
    fused_qkv = "qkv" in layers
    attn_names = ("qkv",) if fused_qkv else ("q", "k", "v")
    if bits == 8:
        big = {n: layers[n]["kernel_q8"]
               for n in attn_names + ("o", "gate", "up", "down")}
        mm = lambda h, e, li: dk.matmul_q8_layered(  # noqa: E731
            h, e["q"], e["scale"], li)
        ffn_fn = dk.ffn_q8_layered
    else:
        big = {n: layers[n]["kernel_q4"]
               for n in attn_names + ("o", "gate", "up", "down")}
        mm = lambda h, e, li: dk.matmul_q4_layered(  # noqa: E731
            h, e["q4"], e["scale"], li)
        ffn_fn = dk.ffn_q4_layered

    small = {"attn_norm": layers["attn_norm"]["scale"],
             "mlp_norm": layers["mlp_norm"]["scale"]}
    for n in attn_names + ("o",):
        if layers[n].get("bias") is not None:
            small[n + "_bias"] = layers[n]["bias"]
    del mask  # the kernel computes masking from valid_len/write_pos

    cache_k, cache_v = cache.k, cache.v
    kv_quant = cache.quantized

    def body(x, scan_in):
        sp, li = scan_in
        h = rms_norm(x, sp["attn_norm"], cfg.rms_norm_eps)
        h2 = h[:, 0]                                   # [B, D]
        if fused_qkv:
            # one layer-indexed kernel over the concatenated pack: one
            # launch + one activation feed instead of three (VERDICT r2 #3)
            qkv = mm(h2, big["qkv"], li)
            if "qkv_bias" in sp:
                qkv = qkv + sp["qkv_bias"].astype(qkv.dtype)
            q = qkv[:, :H * hd]
            k = qkv[:, H * hd:(H + K) * hd]
            v = qkv[:, (H + K) * hd:]
        else:
            q = mm(h2, big["q"], li)
            k = mm(h2, big["k"], li)
            v = mm(h2, big["v"], li)
            if "q_bias" in sp:
                q = q + sp["q_bias"].astype(q.dtype)
                k = k + sp["k_bias"].astype(k.dtype)
                v = v + sp["v_bias"].astype(v.dtype)
        q = q.reshape(B, 1, H, hd)
        k = k.reshape(B, 1, K, hd)
        v = v.reshape(B, 1, K, hd)
        q, k = apply_rope(q, k, cos, sin)
        if kv_quant:
            # quantize the new row with the shared quantizer, then seed the
            # kernel with its DEQUANTIZED values — the current token's
            # self-attention sees exactly what a later verify pass reads
            # back from the int8 cache (token-parity invariant)
            kq, ks = _quantize_kv_rows(k[:, 0])        # [B,K,hd], [B,K]
            vq, vs = _quantize_kv_rows(v[:, 0])
            k_row = (kq.astype(jnp.float32)
                     * ks[..., None]).astype(q.dtype)
            v_row = (vq.astype(jnp.float32)
                     * vs[..., None]).astype(q.dtype)
            out = dk_attn.decode_attention_layered(
                q[:, 0], k_row, v_row, cache_k, cache_v, li, valid_len,
                write_pos, prompt_len, window=cfg.sliding_window,
                k_scale=cache.k_scale, v_scale=cache.v_scale)
            row_out = (kq, ks, vq, vs)
        else:
            k_row = k[:, 0].astype(cache_k.dtype)      # [B, K, hd]
            v_row = v[:, 0].astype(cache_v.dtype)
            out = dk_attn.decode_attention_layered(
                q[:, 0], k_row, v_row, cache_k, cache_v, li, valid_len,
                write_pos, prompt_len, window=cfg.sliding_window)
            row_out = (k_row, v_row)
        out = mm(out.reshape(B, H * hd), big["o"], li)
        if "o_bias" in sp:
            out = out + sp["o_bias"].astype(out.dtype)
        x = x + out[:, None, :]
        h = rms_norm(x, sp["mlp_norm"], cfg.rms_norm_eps)
        wk = "q" if bits == 8 else "q4"
        ffn = ffn_fn(
            h[:, 0], big["gate"][wk], big["gate"]["scale"],
            big["up"][wk], big["up"]["scale"],
            big["down"][wk], big["down"]["scale"], li)
        return x + ffn[:, None, :], row_out

    x, rows = jax.lax.scan(
        body, token_embeds, (small, jnp.arange(L, dtype=jnp.int32)))
    if kv_quant:
        k_rows, ks_rows, v_rows, vs_rows = rows     # int8 rows + f32 scales
        new_k = jax.lax.dynamic_update_slice(
            cache_k, k_rows.reshape(L, B, 1, K * hd), (0, 0, write_pos, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache_v, v_rows.reshape(L, B, 1, K * hd), (0, 0, write_pos, 0))
        # scales live [L, B, K, M]: the new column lands at lane write_pos
        new_ks = jax.lax.dynamic_update_slice(
            cache.k_scale, ks_rows[..., None], (0, 0, 0, write_pos))
        new_vs = jax.lax.dynamic_update_slice(
            cache.v_scale, vs_rows[..., None], (0, 0, 0, write_pos))
        new_cache = KVCache(new_k, new_v, new_ks, new_vs)
    else:
        k_rows, v_rows = rows
        # one aligned write of every layer's new row: [L, B, 1, K*hd]
        new_k = jax.lax.dynamic_update_slice(
            cache_k, k_rows.reshape(L, B, 1, K * hd), (0, 0, write_pos, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache_v, v_rows.reshape(L, B, 1, K * hd), (0, 0, write_pos, 0))
        new_cache = KVCache(new_k, new_v)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    logits = lm_logits(params, cfg, x[:, 0])
    return logits, new_cache
