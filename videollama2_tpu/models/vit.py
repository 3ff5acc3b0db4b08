"""Unified vision transformer: CLIP ViT-L/14-336 and SigLIP-SO400M/14-384.

Parity target: reference videollama2/model/encoder.py:12-164 — thin wrappers
over HF CLIPVisionModel / SiglipVisionModel that return
`hidden_states[select_layer]` (CLS dropped for CLIP 'patch' mode). The tower
is FROZEN in every reference training recipe (train.py:534), so no grads flow
through it; we exploit that by running only the first
`select_layer % (num_layers+1)` encoder layers — for the default -2 that
skips the final layer's FLOPs entirely (HF computes it and throws it away).

TPU-first choices: layers stacked + lax.scan; patch conv via XLA
conv_general_dilated (maps to MXU); batch dim is (batch*frames) so the MXU
sees one large GEMM per layer across all frames.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core.config import VisionConfig
from ..ops import attention as attn_ops
from ..ops.layers import ACT2FN, dense, layer_norm


def init_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    keys = jax.random.split(rng, 12)
    std = 0.02

    def normal(key, shape):
        # generate directly in the target dtype: fp32 transients of the
        # stacked 7B tensors would exceed HBM during init
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    def ln(shape=(L, D)):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    layers = {
        "ln1": ln(), "ln2": ln(),
        "q": {"kernel": normal(keys[0], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "k": {"kernel": normal(keys[1], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "v": {"kernel": normal(keys[2], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "o": {"kernel": normal(keys[3], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "fc1": {"kernel": normal(keys[4], (L, D, F)),
                "bias": jnp.zeros((L, F), dtype)},
        "fc2": {"kernel": normal(keys[5], (L, F, D)),
                "bias": jnp.zeros((L, D), dtype)},
    }
    params = {
        "patch_embed": {"kernel": normal(keys[6], (P, P, 3, D))},
        "pos_embed": {"weight": normal(keys[7], (cfg.seq_len, D))},
        "layers": layers,
        "post_ln": {"scale": jnp.ones((D,), dtype),
                    "bias": jnp.zeros((D,), dtype)},
    }
    if cfg.variant == "clip":
        params["cls_token"] = {"weight": normal(keys[8], (D,))}
        params["pre_ln"] = {"scale": jnp.ones((D,), dtype),
                            "bias": jnp.zeros((D,), dtype)}
    else:
        params["patch_embed"]["bias"] = jnp.zeros((D,), dtype)
    return params


def _patch_embed(params: dict, cfg: VisionConfig, pixels: jax.Array
                 ) -> jax.Array:
    """pixels: [N, H, W, 3] -> [N, num_patches, D] via strided conv."""
    kernel = params["patch_embed"]["kernel"].astype(pixels.dtype)
    P = cfg.patch_size
    out = jax.lax.conv_general_dilated(
        pixels, kernel, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params["patch_embed"]:
        out = out + params["patch_embed"]["bias"].astype(out.dtype)
    n, h, w, d = out.shape
    return out.reshape(n, h * w, d)


def embeddings(params: dict, cfg: VisionConfig, pixels: jax.Array
               ) -> jax.Array:
    """HF CLIPVisionEmbeddings / SiglipVisionEmbeddings."""
    x = _patch_embed(params, cfg, pixels)
    n = x.shape[0]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(
            params["cls_token"]["weight"].astype(x.dtype)[None, None, :],
            (n, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]["weight"].astype(x.dtype)[None]
    return x


def _fuse_qkv_layers(layers: dict) -> dict:
    """Concatenate the stacked q/k/v kernels+biases into one `qkv` entry
    (one [N*S, D] @ [D, 3D] GEMM per layer instead of three — fewer
    dispatches, deeper MXU occupancy; VERDICT r2 #5). Runs inside jit once
    per encoder call; the tower is frozen so XLA hoists/CSEs the concat.
    int8 towers (ops/quant.quantize_vision_params) fuse their packs the
    same way — concat is along the output axis, scales ride along."""
    if "kernel" in layers["q"]:
        qkv = {"kernel": jnp.concatenate(
            [layers[n]["kernel"] for n in ("q", "k", "v")], axis=-1)}
    else:
        qkv = {"kernel_q8": {
            "q": jnp.concatenate(
                [layers[n]["kernel_q8"]["q"] for n in ("q", "k", "v")],
                axis=-1),
            "scale": jnp.concatenate(
                [layers[n]["kernel_q8"]["scale"] for n in ("q", "k", "v")],
                axis=-1)}}
    qkv["bias"] = jnp.concatenate(
        [layers[n]["bias"] for n in ("q", "k", "v")], axis=-1)
    out = {n: e for n, e in layers.items() if n not in ("q", "k", "v")}
    out["qkv"] = qkv
    return out


def _encoder_layer(cfg: VisionConfig, x: jax.Array, lp: dict,
                   attn_impl: str, valid_len=None) -> jax.Array:
    N, S, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    act = ACT2FN[cfg.hidden_act]
    h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                   cfg.layer_norm_eps)
    if "qkv" in lp:
        qkv = dense(h, lp["qkv"])
        q, k, v = (qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:])
    else:
        q, k, v = dense(h, lp["q"]), dense(h, lp["k"]), dense(h, lp["v"])
    q = q.reshape(N, S, H, hd)
    k = k.reshape(N, S, H, hd)
    v = v.reshape(N, S, H, hd)
    attn = attn_ops.attend(q, k, v, valid_len=valid_len, causal=False,
                           impl=attn_impl)
    x = x + dense(attn.reshape(N, S, D), lp["o"])
    h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                   cfg.layer_norm_eps)
    return x + dense(act(dense(h, lp["fc1"])), lp["fc2"])


def _pad_tokens(x: jax.Array, attn_impl: str):
    """Zero-pad the token dim to a 16-sublane multiple ONCE for the whole
    encoder so every layer's attention can take the Pallas kernel path
    (577/729 patch counts otherwise fail its S-divisibility gate and fall
    back to XLA, whose materialized [S, S] probs cost ~5 ms/layer of HBM
    traffic at 128 frames). 16 (the bf16 sublane tile), not 128: attention
    score tiles pad to 128 lanes internally either way, but every dense
    GEMM and elementwise pass in the tower shrinks with S (577 -> 592
    instead of 640 is ~7.5% of the tower's FLOPs). Padded keys are masked
    via valid_len; padded query rows compute garbage and are sliced off
    after the layer scan."""
    S = x.shape[1]
    pad = (-S) % 16
    if pad == 0 or attn_impl == "xla" or not attn_ops._on_tpu():
        return x, None, S
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    valid = jnp.full((x.shape[0],), S, jnp.int32)
    return x, valid, S


def _slice_layers(layers: dict, n: int) -> dict:
    return jax.tree.map(lambda a: a[:n], layers)


def features(params: dict, cfg: VisionConfig, pixels: jax.Array,
             attn_impl: str = "auto") -> jax.Array:
    """Frozen feature extraction: hidden_states[select_layer] (+CLS drop).

    pixels: [N, H, W, 3] preprocessed frames. Returns [N, tokens, D].
    Equivalent to encoder.py:31-53 / 103-123, but computes only the layers
    actually needed for `select_layer`.
    """
    x = embeddings(params, cfg, pixels)
    if cfg.variant == "clip":
        x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                       cfg.layer_norm_eps)
    sel = cfg.select_layer % (cfg.num_layers + 1)  # hidden_states index
    layers = _fuse_qkv_layers(_slice_layers(params["layers"], sel))
    x, valid, S = _pad_tokens(x, attn_impl)

    def body(h, lp):
        return _encoder_layer(cfg, h, lp, attn_impl, valid), None

    x, _ = jax.lax.scan(body, x, layers)
    x = x[:, :S]
    if cfg.select_feature == "patch" and cfg.use_cls_token:
        x = x[:, 1:]
    elif cfg.select_feature not in ("patch", "cls_patch"):
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
    return x


def forward_full(params: dict, cfg: VisionConfig, pixels: jax.Array,
                 attn_impl: str = "auto") -> jax.Array:
    """All layers + post-LN last hidden state (for completeness/eval)."""
    x = embeddings(params, cfg, pixels)
    if cfg.variant == "clip":
        x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                       cfg.layer_norm_eps)

    x, valid, S = _pad_tokens(x, attn_impl)

    def body(h, lp):
        return _encoder_layer(cfg, h, lp, attn_impl, valid), None

    x, _ = jax.lax.scan(body, x, _fuse_qkv_layers(params["layers"]))
    x = x[:, :S]
    return layer_norm(x, params["post_ln"]["scale"], params["post_ln"]["bias"],
                      cfg.layer_norm_eps)
