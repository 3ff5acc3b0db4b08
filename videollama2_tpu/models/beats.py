"""BEATs audio encoder (VideoLLaMA2.1-AV's audio tower).

The reference's audio branch lives on the upstream `audio_visual` branch
(README.md:60,130-132) and uses the fine-tuned BEATs_iter3+(AS2M)(cpt2)
encoder. Rebuilt here from the public BEATs architecture
(microsoft/unilm/beats):

  fbank [T, 128] -> 16x16 patch Conv2d (no bias) -> LN -> 512->768 proj ->
  conv positional embedding (k=128, groups=16, GELU) ->
  12 post-LN transformer layers with GATED RELATIVE POSITION BIAS
  (WavLM-style: 320 buckets, max distance 800, bias computed once and shared
  across layers; per-layer query-conditioned gate) and deep-norm residual
  scaling alpha = (2L)^(1/4).

Checkpoint conversion for the HF AV release maps 1:1 onto this param tree
(checkpoint/convert_hf.py grows the audio branch when the AV config is
present); numerical parity against the torch BEATs is validated by
tests/test_beats_parity.py's torch replica of the same architecture.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.config import AudioConfig
from ..ops.layers import dense, gelu_exact, layer_norm


# ---------------------------------------------------------------------------
# Relative position buckets (T5/WavLM bidirectional bucketing)
# ---------------------------------------------------------------------------

def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 320,
                             max_distance: int = 800) -> jnp.ndarray:
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_embed: jnp.ndarray, seq_len: int,
                          num_buckets: int = 320,
                          max_distance: int = 800) -> jnp.ndarray:
    """rel_embed: [num_buckets, H] -> bias [H, S, S]."""
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, num_buckets, max_distance)
    bias = jnp.take(rel_embed, buckets, axis=0)  # [S, S, H]
    return bias.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: AudioConfig,
                dtype=jnp.float32) -> dict:
    L, D, F = cfg.num_layers, cfg.encoder_dim, cfg.intermediate_size
    H = cfg.num_heads
    E = cfg.embed_dim
    ks = jax.random.split(rng, 16)
    std = 0.02

    def normal(key, shape):
        # generate directly in the target dtype: fp32 transients of the
        # stacked 7B tensors would exceed HBM during init
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    def ln(shape):
        return {"scale": jnp.ones(shape, dtype),
                "bias": jnp.zeros(shape, dtype)}

    layers = {
        "q": {"kernel": normal(ks[0], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "k": {"kernel": normal(ks[1], (L, D, D))},  # BEATs k_proj: no bias
        "v": {"kernel": normal(ks[2], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        "o": {"kernel": normal(ks[3], (L, D, D)),
              "bias": jnp.zeros((L, D), dtype)},
        # grep_linear is SHARED across heads (WavLM: nn.Linear(head_dim, 8))
        "grep": {"kernel": normal(ks[4], (L, D // cfg.num_heads, 8)),
                 "bias": jnp.zeros((L, 8), dtype)},
        "grep_a": jnp.ones((L, cfg.num_heads, 1, 1), dtype),
        "ln1": ln((L, D)), "ln2": ln((L, D)),
        "fc1": {"kernel": normal(ks[6], (L, D, F)),
                "bias": jnp.zeros((L, F), dtype)},
        "fc2": {"kernel": normal(ks[7], (L, F, D)),
                "bias": jnp.zeros((L, D), dtype)},
    }
    return {
        "patch_embed": {"kernel": normal(ks[8], (16, 16, 1, E))},
        "pre_ln": ln((E,)),
        "post_extract_proj": {"kernel": normal(ks[9], (E, D)),
                              "bias": jnp.zeros((D,), dtype)},
        "pos_conv": {"kernel": normal(ks[10],
                                      (cfg.conv_pos, D // cfg.conv_pos_groups,
                                       D)),
                     "bias": jnp.zeros((D,), dtype)},
        # encoder-level LN after the positional conv (fairseq backbone:
        # layer_norm_first=False applies encoder.layer_norm to the input)
        "enc_ln": ln((D,)),
        "rel_embed": normal(ks[11], (320, cfg.num_heads)),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attention(cfg: AudioConfig, x, lp, pos_bias):
    """WavLM-style attention with gated relative position bias.

    x: [B, S, D]; pos_bias: [H, S, S].
    """
    B, S, D = x.shape
    H = cfg.num_heads
    hd = D // H
    scale = hd ** -0.5
    q = dense(x, lp["q"]).reshape(B, S, H, hd)
    k = jnp.einsum("bsd,dk->bsk", x,
                   lp["k"]["kernel"].astype(x.dtype)).reshape(B, S, H, hd)
    v = dense(x, lp["v"]).reshape(B, S, H, hd)

    # gated bias: gate from the query (grep linear -> [.., 2, 4] sum -> gates)
    g = jnp.einsum("bshd,de->bshe", q, lp["grep"]["kernel"].astype(x.dtype))
    g = g + lp["grep"]["bias"].astype(x.dtype)[None, None, None]
    g = g.reshape(B, S, H, 2, 4).sum(-1)
    gates = jax.nn.sigmoid(g)                       # [B, S, H, 2]
    gate_a, gate_b = gates[..., 0], gates[..., 1]
    grep_a = lp["grep_a"].astype(x.dtype)[..., 0, 0]  # [H]
    gate_a_1 = gate_a * (gate_b * grep_a[None, None] - 1.0) + 2.0
    # [B, H, S, S] gated bias
    bias = gate_a_1.transpose(0, 2, 1)[..., None] * pos_bias[None]

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return dense(out.reshape(B, S, D), lp["o"])


def forward(params: dict, cfg: AudioConfig, fbank_feats: jax.Array
            ) -> jax.Array:
    """fbank_feats: [B, T, 128] normalized features -> [B, tokens, D]."""
    B = fbank_feats.shape[0]
    x = fbank_feats[..., None]                         # [B, T, 128, 1]
    kernel = params["patch_embed"]["kernel"].astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(16, 16), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # [B, T/16, 8, E]
    bt, bf = x.shape[1], x.shape[2]
    x = x.reshape(B, bt * bf, x.shape[-1])
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)
    x = dense(x, params["post_extract_proj"])

    # conv positional embedding (same-ish padding, drop last when even kernel)
    pc = params["pos_conv"]
    pos = jax.lax.conv_general_dilated(
        x, pc["kernel"].astype(x.dtype), window_strides=(1,),
        padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.conv_pos_groups)
    pos = pos + pc["bias"].astype(x.dtype)
    if cfg.conv_pos % 2 == 0:
        pos = pos[:, :-1]
    x = x + gelu_exact(pos[:, :x.shape[1]])
    # post-norm backbone (layer_norm_first=False): encoder.layer_norm runs
    # on the pos-conv-augmented input before the layer stack
    x = layer_norm(x, params["enc_ln"]["scale"], params["enc_ln"]["bias"],
                   cfg.layer_norm_eps)

    S = x.shape[1]
    pos_bias = compute_position_bias(
        params["rel_embed"].astype(jnp.float32), S)
    alpha = (2 * cfg.num_layers) ** 0.25 if cfg.deep_norm else 1.0

    lp_all = params["layers"]
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], lp_all)
        attn = _attention(cfg, x, lp, pos_bias)
        x = layer_norm(x * alpha + attn, lp["ln1"]["scale"],
                       lp["ln1"]["bias"], cfg.layer_norm_eps)
        h = gelu_exact(dense(x, lp["fc1"]))
        h = dense(h, lp["fc2"])
        x = layer_norm(x * alpha + h, lp["ln2"]["scale"],
                       lp["ln2"]["bias"], cfg.layer_norm_eps)
    return x
