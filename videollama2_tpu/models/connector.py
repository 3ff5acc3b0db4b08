"""Spatial-temporal connectors (projectors): STC / STP / Spatial / MLP / linear.

Parity target: reference videollama2/model/projector.py:95-250. The RegNet
stages come from timm's `RegStage` of SE-Bottleneck blocks (projector.py:153-186,
act=SiLU, norm=LayerNorm2d); timm is not a dependency here — the block is
re-implemented channels-last for TPU:

  Bottleneck(in, out):                       # timm.models.regnet.Bottleneck
    conv1: 1x1 conv(no bias) -> LayerNorm2d -> SiLU
    conv2: 3x3 DEPTHWISE conv (group_size=1 => groups=channels) -> LN2d -> SiLU
    se:    global-mean -> 1x1 fc1(+bias) -> SiLU -> 1x1 fc2(+bias) -> sigmoid
           (rd_channels = round(in_chs * 0.25))
    conv3: 1x1 conv(no bias) -> LayerNorm2d (no act)
    shortcut: identity, or 1x1 conv -> LN2d when in != out (block 1 only)
    out = SiLU(conv3_path + shortcut)

LayerNorm2d normalizes over channels at each spatial position (eps 1e-6,
timm default) — in our NHWC layout that is a plain last-axis LayerNorm.

The 3D downsampler is torch Conv3d(kernel=stride=downsample, padding=1 for
stc_connector / 0 for stc_connector_v35) + SiLU (projector.py:164-174,229-238).
The readout MLP uses exact (erf) GELU (torch nn.GELU default).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from ..core.config import ConnectorConfig
from ..ops.conv import avg_pool3d, conv2d, conv3d
from ..ops.layers import gelu_exact, layer_norm

LN2D_EPS = 1e-6  # timm LayerNorm2d default


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_conv(rng, kshape, dtype, bias_ch=None):
    fan_in = 1
    for s in kshape[:-1]:
        fan_in *= s
    w = jax.random.normal(rng, kshape, jnp.float32) * (2.0 / fan_in) ** 0.5
    p = {"kernel": w.astype(dtype)}
    if bias_ch is not None:
        p["bias"] = jnp.zeros((bias_ch,), dtype)
    return p


def _init_cna(rng, cin, cout, k, dtype, depthwise=False):
    kin = 1 if depthwise else cin
    return {"conv": _init_conv(rng, (k, k, kin, cout), dtype),
            "norm": {"scale": jnp.ones((cout,), dtype),
                     "bias": jnp.zeros((cout,), dtype)}}


def _init_block(rng, cin, cout, dtype):
    ks = jax.random.split(rng, 8)
    rd = int(round(cin * 0.25))
    block = {
        "conv1": _init_cna(ks[0], cin, cout, 1, dtype),
        "conv2": _init_cna(ks[1], cout, cout, 3, dtype, depthwise=True),
        "se": {"fc1": _init_conv(ks[2], (1, 1, cout, rd), dtype, bias_ch=rd),
               "fc2": _init_conv(ks[3], (1, 1, rd, cout), dtype,
                                 bias_ch=cout)},
        "conv3": _init_cna(ks[4], cout, cout, 1, dtype),
    }
    if cin != cout:
        block["downsample"] = _init_cna(ks[5], cin, cout, 1, dtype)
    return block


def _init_mlp(rng, depth, d_in, d_out, dtype):
    ks = jax.random.split(rng, depth)
    out = {}
    cur = d_in
    for d in range(depth):
        std = (1.0 / cur) ** 0.5
        w = jax.random.uniform(ks[d], (cur, d_out), jnp.float32, -std, std)
        out[f"fc{d+1}"] = {"kernel": w.astype(dtype),
                           "bias": jnp.zeros((d_out,), dtype)}
        cur = d_out
    return out


def init_params(rng: jax.Array, cfg: ConnectorConfig,
                dtype=jnp.float32) -> dict:
    pt = cfg.projector_type
    ks = jax.random.split(rng, 8)
    if pt == "linear":
        return _init_mlp(ks[0], 1, cfg.mm_hidden_size, cfg.hidden_size, dtype)
    m = re.match(r"^mlp(\d+)x_gelu$", pt)
    if m:
        return _init_mlp(ks[0], int(m.group(1)), cfg.mm_hidden_size,
                         cfg.hidden_size, dtype)
    if pt == "identity":
        return {}
    params: dict = {}
    if cfg.depth != 0:
        s1 = {}
        s2 = {}
        for i in range(cfg.depth):
            cin = cfg.mm_hidden_size if i == 0 else cfg.hidden_size
            s1[f"b{i+1}"] = _init_block(jax.random.fold_in(ks[0], i), cin,
                                        cfg.hidden_size, dtype)
            s2[f"b{i+1}"] = _init_block(jax.random.fold_in(ks[1], i),
                                        cfg.hidden_size, cfg.hidden_size,
                                        dtype)
        params["s1"], params["s2"] = s1, s2
    if pt in ("stc_connector", "stc_connector_v35", "spatial_conv"):
        dt, dh, dw = cfg.downsample
        params["sampler"] = _init_conv(
            ks[2], (dt, dh, dw, cfg.hidden_size, cfg.hidden_size), dtype,
            bias_ch=cfg.hidden_size)
    params["readout"] = _init_mlp(ks[3], cfg.mlp_depth, cfg.hidden_size,
                                  cfg.hidden_size, dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln2d(x, p):
    return layer_norm(x, p["scale"], p["bias"], LN2D_EPS)


def _cna(x, p, stride=1, padding=0, groups=1, act=True):
    x = conv2d(x, p["conv"]["kernel"], p["conv"].get("bias"), stride=stride,
               padding=padding, groups=groups)
    x = _ln2d(x, p["norm"])
    return jax.nn.silu(x) if act else x


def _bottleneck(x: jax.Array, bp: dict) -> jax.Array:
    """x: [N, H, W, C_in] -> [N, H, W, C_out]."""
    shortcut = x
    h = _cna(x, bp["conv1"])
    h = _cna(h, bp["conv2"], padding=1, groups=h.shape[-1])
    # SE
    se = jnp.mean(h, axis=(1, 2), keepdims=True)
    se = conv2d(se, bp["se"]["fc1"]["kernel"], bp["se"]["fc1"]["bias"])
    se = jax.nn.silu(se)
    se = conv2d(se, bp["se"]["fc2"]["kernel"], bp["se"]["fc2"]["bias"])
    h = h * jax.nn.sigmoid(se)
    h = _cna(h, bp["conv3"], act=False)
    if "downsample" in bp:
        shortcut = _cna(shortcut, bp["downsample"], act=False)
    return jax.nn.silu(h + shortcut)


def _regstage(x: jax.Array, sp: dict) -> jax.Array:
    for i in range(1, len(sp) + 1):
        x = _bottleneck(x, sp[f"b{i}"])
    return x


def _mlp(x: jax.Array, mp: dict) -> jax.Array:
    n = len(mp)
    for d in range(1, n + 1):
        p = mp[f"fc{d}"]
        x = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
        x = x + p["bias"].astype(x.dtype)
        if d < n:
            x = gelu_exact(x)
    return x


def apply(params: dict, cfg: ConnectorConfig, x: jax.Array) -> jax.Array:
    """Connector forward.

    x: [B, T, N, D] per-frame vision features (N = h*w patches).
    Returns [B, tokens, hidden]. Mean-pool-then-project for linear/mlp types
    happens in the caller (videollama2.py temporal_aggregator parity).
    """
    pt = cfg.projector_type
    if pt == "identity":
        b, t, n, d = x.shape
        return x.reshape(b, t * n, d)
    if pt == "linear" or re.match(r"^mlp(\d+)x_gelu$", pt):
        # caller already mean-pooled over time: x is [B, N, D]
        return _mlp(x, params)

    b, t, n, d = x.shape
    hw = int(round(n ** 0.5))
    x = x.reshape(b * t, hw, hw, d)
    if cfg.depth != 0:
        x = _regstage(x, params["s1"])
    c = x.shape[-1]
    x = x.reshape(b, t, hw, hw, c)
    if pt in ("stc_connector", "stc_connector_v35", "spatial_conv"):
        pad = 1 if pt in ("stc_connector", "spatial_conv") else 0
        x = conv3d(x, params["sampler"]["kernel"], params["sampler"]["bias"],
                   stride=cfg.downsample, padding=pad)
        x = jax.nn.silu(x)
    else:  # stp_connector / spatial_pool: AvgPool3d + SiLU
        x = jax.nn.silu(avg_pool3d(x, cfg.downsample))
    bb, nt, nh, nw, c = x.shape
    x = x.reshape(b * nt, nh, nw, c)
    if cfg.depth != 0:
        x = _regstage(x, params["s2"])
    x = x.reshape(b, nt * nh * nw, c)
    return _mlp(x, params["readout"])
