"""Full multimodal model assembly: vision tower + connector + LLM.

Parity: reference videollama2/model/videollama2_arch.py (Videollama2MetaModel
/ Videollama2MetaForCausalLM) — vision encode over (b t) flattened frames,
projector-type-dependent temporal aggregation, and the modal-token splice
(here the static-shape version from multimodal/splice.py).

Params tree: {"llm": ..., "vision": ..., "connector": ...[, "audio": ...]}.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..multimodal import splice as splice_lib
from . import connector as connector_lib
from . import llm as llm_lib
from . import vit as vit_lib


def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    params = {
        "llm": llm_lib.init_params(k1, cfg.llm, dtype),
        "vision": vit_lib.init_params(k2, cfg.vision, dtype),
        "connector": connector_lib.init_params(k3, cfg.connector, dtype),
    }
    if cfg.audio is not None:
        from . import beats as beats_lib
        params["audio"] = {
            "encoder": beats_lib.init_params(k4, cfg.audio, dtype),
            "projector": connector_lib._init_mlp(
                k5, 2, cfg.audio.encoder_dim, cfg.llm.hidden_size, dtype),
        }
    return params


def _i420_to_rgb(buf: jax.Array) -> jax.Array:
    """Device-side I420 unpack: uint8 [B, T, H*3/2, W] -> float32 RGB
    [B, T, H, W, 3] in [0, 255]. Must match media/wire.i420_to_rgb exactly
    (tests/test_wire.py): BT.601 full-range inverse, nearest 2x chroma
    upsample. Pure VPU elementwise + reshapes — XLA fuses it into the
    normalize that follows in encode_frames."""
    from ..media import wire
    B, T = buf.shape[0], buf.shape[1]
    H = buf.shape[2] * 2 // 3
    W = buf.shape[3]
    f = buf.astype(jnp.float32)
    y = f[:, :, :H]
    cb = f[:, :, H:H + H // 4].reshape(B, T, H // 2, W // 2) - 128.0
    cr = f[:, :, H + H // 4:].reshape(B, T, H // 2, W // 2) - 128.0
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=2), 2, axis=3)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=2), 2, axis=3)
    r = y + wire.INV_R_CR * cr
    g = y - wire.INV_G_CB * cb - wire.INV_G_CR * cr
    b = y + wire.INV_B_CB * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def encode_frames(params: dict, cfg: ModelConfig, frames: jax.Array,
                  attn_impl: str = "auto",
                  broadcast_image: bool = False) -> jax.Array:
    """Encode a batch of videos' frames through the frozen tower + connector.

    frames: [B, T, H, W, 3] preprocessed pixels (images are expanded to T
    identical frames by the caller, parity videollama2_arch.py:119-120), OR
    [B, T, H*3/2, W] planar uint8 I420 (media/wire.py — the 1.5-byte/px
    wire format; YUV->RGB runs here on device, fused into the normalize).
    With broadcast_image=True, frames is [B, 1, ...]: the tower runs
    ONCE per image and the features are broadcast to num_frames — identical
    result to the reference's T redundant tower passes at 1/T the FLOPs.
    Returns [B, tokens_per_video, hidden].
    """
    B, T = frames.shape[0], frames.shape[1]
    raw255 = None
    if frames.ndim == 4:
        if frames.dtype != jnp.uint8:
            raise ValueError("planar I420 frames must be uint8")
        raw255 = _i420_to_rgb(frames)  # [B, T, H, W, 3] f32 in [0, 255]
    elif frames.dtype == jnp.uint8:
        raw255 = frames.astype(jnp.float32)
    if raw255 is not None:
        # on-device normalize: callers ship resized uint8 RGB (4x less
        # host->HBM traffic than fp32) or planar I420 (6x less — the
        # north star's fused preprocess; media/wire.py)
        mean = jnp.asarray(cfg.vision.image_mean, jnp.float32)
        std = jnp.asarray(cfg.vision.image_std, jnp.float32)
        frames = ((raw255 / 255.0 - mean) / std).astype(jnp.bfloat16)
    flat = frames.reshape((B * T,) + frames.shape[2:])
    feats = _tower_features(params, cfg, flat, attn_impl)
    feats = jax.lax.stop_gradient(feats)  # tower frozen (train.py:534)
    feats = feats.reshape(B, T, feats.shape[1], feats.shape[2])
    if broadcast_image:
        feats = jnp.broadcast_to(
            feats, (B, cfg.num_frames) + feats.shape[2:])
    return temporal_aggregator(params, cfg, feats)


def _tower_features(params: dict, cfg: ModelConfig, flat: jax.Array,
                    attn_impl: str) -> jax.Array:
    """Tower forward over [N, H, W, 3] frames, chunked along N.

    Large-batch prefill (e.g. B=16 x 16 frames = 256 tower passes) peaks
    several GB of tower activations if run as one batch; lax.map over
    chunks of VIT_ENCODE_CHUNK (default 128, divisor-adjusted) serializes
    the chunks so only one chunk's activations are ever live — 128 frames
    already saturate the chip's MXU, so the serialization is free. This is
    what lets the B=16 int8+kv8 bench config fit 16 GB HBM."""
    import os
    N = flat.shape[0]
    chunk = int(os.environ.get("VIT_ENCODE_CHUNK", "128"))
    while chunk > 1 and N % chunk:
        chunk //= 2
    if N <= chunk or N % chunk:
        return vit_lib.features(params["vision"], cfg.vision, flat,
                                attn_impl=attn_impl)
    fr = flat.reshape((N // chunk, chunk) + flat.shape[1:])
    feats = jax.lax.map(
        lambda f: vit_lib.features(params["vision"], cfg.vision, f,
                                   attn_impl=attn_impl), fr)
    return feats.reshape((N,) + feats.shape[2:])


def encode_audio(params: dict, cfg: ModelConfig,
                 fbank_feats: jax.Array) -> jax.Array:
    """Frozen BEATs encode + audio projector (VideoLLaMA2.1-AV branch).

    fbank_feats: [B, audio.max_frames, 128] -> [B, tokens_per_audio, D_llm].
    """
    from . import beats as beats_lib
    from . import connector as connector_lib
    feats = beats_lib.forward(params["audio"]["encoder"], cfg.audio,
                              fbank_feats)
    feats = jax.lax.stop_gradient(feats)
    return connector_lib._mlp(feats, params["audio"]["projector"])


def temporal_aggregator(params: dict, cfg: ModelConfig,
                        frame_feats: jax.Array) -> jax.Array:
    """Projector-type dispatch (videollama2_arch.py:136-159).

    frame_feats: [B, T, N, D_vision] -> [B, tokens, D_llm].
    """
    pt = cfg.connector.projector_type
    if pt in ("mlp2x_gelu", "linear") or pt.startswith("mlp"):
        pooled = jnp.mean(frame_feats, axis=1)  # mean over time (:144-146)
        return connector_lib.apply(params["connector"], cfg.connector, pooled)
    return connector_lib.apply(params["connector"], cfg.connector,
                               frame_feats)


def forward_train(params: dict, cfg: ModelConfig, frames: jax.Array,
                  text_ids: jax.Array, is_visual: jax.Array,
                  vis_index: jax.Array, positions: jax.Array,
                  valid_len: jax.Array, labels: jax.Array,
                  attn_impl: str = "auto", remat: bool = True,
                  constrain_fn=None) -> Tuple[jax.Array, dict]:
    """Training forward: returns (mean masked CE loss, metrics).

    frames: [B, T, H, W, 3] (zeros slot for text-only samples); the splice
    plan arrays come from
    multimodal.splice.plan_batch. Labels use IGNORE_INDEX for unsupervised
    positions; loss is next-token CE over supervised positions (HF causal-LM
    shift semantics).

    constrain_fn (optional): batch-sharding annotator applied to the big
    intermediates (visual tokens, spliced embeddings). Without it, GSPMD
    re-derived a conflicting sharding for the splice where's backward and
    fell back to an involuntary full rematerialization (replicate + reshard).
    """
    from ..constants import IGNORE_INDEX

    vis_tokens = encode_frames(params, cfg, frames, attn_impl=attn_impl)
    if constrain_fn is not None:
        vis_tokens = constrain_fn(vis_tokens)
    text_emb = llm_lib.embed_tokens(params["llm"], text_ids,
                                    dtype=vis_tokens.dtype)
    embeds = splice_lib.compose_embeds(text_emb, vis_tokens, is_visual,
                                       vis_index)
    if constrain_fn is not None:
        embeds = constrain_fn(embeds)
    hidden, _ = llm_lib.forward(params["llm"], cfg.llm, embeds, positions,
                                valid_len, attn_impl=attn_impl, remat=remat)
    logits = llm_lib.lm_logits(params["llm"], cfg.llm, hidden)  # [B,S,V] f32

    # shift: predict labels[t+1] from logits[t]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != IGNORE_INDEX)
    safe_labels = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None],
                                   axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    loss = -jnp.sum(jnp.where(mask, token_ll, 0.0)) / denom
    correct = jnp.sum((jnp.argmax(shift_logits, -1) == safe_labels) & mask)
    metrics = {"loss": loss, "num_tokens": jnp.sum(mask),
               "accuracy": correct / denom}
    return loss, metrics


def prefill_multimodal(params: dict, cfg: ModelConfig, frames: jax.Array,
                       text_ids: jax.Array, is_visual: jax.Array,
                       vis_index: jax.Array, positions: jax.Array,
                       valid_len: jax.Array, cache: llm_lib.KVCache,
                       attn_impl: str = "auto",
                       broadcast_image: bool = False
                       ) -> Tuple[jax.Array, llm_lib.KVCache]:
    """Inference prefill with visual splice. Returns (last_hidden, cache)."""
    vis_tokens = encode_frames(params, cfg, frames, attn_impl=attn_impl,
                               broadcast_image=broadcast_image)
    text_emb = llm_lib.embed_tokens(params["llm"], text_ids,
                                    dtype=vis_tokens.dtype)
    embeds = splice_lib.compose_embeds(text_emb, vis_tokens, is_visual,
                                       vis_index)
    return llm_lib.prefill(params["llm"], cfg.llm, embeds, positions,
                           valid_len, cache, attn_impl=attn_impl)
