"""STC connector parity vs a torch replica of timm's RegStage bottleneck.

timm isn't installed in this image, so the test carries a faithful torch
re-implementation of timm.models.regnet.Bottleneck (same state_dict key
layout: conv{1,2,3}.{conv,bn}, se.fc{1,2}, downsample.{conv,bn}) and of the
reference STCConnector forward (projector.py:133-238). This validates both
torch-conv semantics of ops/conv.py and the checkpoint converter's key
mapping / transpositions.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from videollama2_tpu.core.config import ConnectorConfig
from videollama2_tpu.checkpoint.convert_hf import (
    connector_params_from_state_dict)
from videollama2_tpu.models import connector as conn
from videollama2_tpu.ops.conv import avg_pool3d, conv2d, conv3d


class LayerNorm2d(nn.LayerNorm):
    """timm.layers.LayerNorm2d: channel LN on NCHW, eps 1e-6."""

    def __init__(self, ch):
        super().__init__(ch, eps=1e-6)

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class ConvNormAct(nn.Module):
    def __init__(self, cin, cout, k, groups=1, apply_act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, groups=groups,
                              bias=False)
        self.bn = LayerNorm2d(cout)
        self.act = nn.SiLU() if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SEModule(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1, bias=True)
        self.act = nn.SiLU()
        self.fc2 = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(self.act(self.fc1(s)))
        return x * torch.sigmoid(s)


class Bottleneck(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = ConvNormAct(cin, cout, 1)
        self.conv2 = ConvNormAct(cout, cout, 3, groups=cout)  # group_size=1
        self.se = SEModule(cout, int(round(cin * 0.25)))
        self.conv3 = ConvNormAct(cout, cout, 1, apply_act=False)
        self.act3 = nn.SiLU()
        self.downsample = (ConvNormAct(cin, cout, 1, apply_act=False)
                           if cin != cout else nn.Identity())

    def forward(self, x):
        sc = x
        x = self.conv3(self.se(self.conv2(self.conv1(x))))
        return self.act3(x + self.downsample(sc))


class RegStage(nn.Module):
    def __init__(self, depth, cin, cout):
        super().__init__()
        for i in range(depth):
            self.add_module(f"b{i+1}",
                            Bottleneck(cin if i == 0 else cout, cout))

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class TorchSTC(nn.Module):
    """Reference STCConnector forward (projector.py:189-215)."""

    def __init__(self, cfg: ConnectorConfig):
        super().__init__()
        self.cfg = cfg
        if cfg.depth:
            self.s1 = RegStage(cfg.depth, cfg.mm_hidden_size, cfg.hidden_size)
            self.s2 = RegStage(cfg.depth, cfg.hidden_size, cfg.hidden_size)
        ds = cfg.downsample
        if "stc" in cfg.projector_type or cfg.projector_type == "spatial_conv":
            pad = 0 if cfg.projector_type == "stc_connector_v35" else 1
            self.sampler = nn.Sequential(
                nn.Conv3d(cfg.hidden_size, cfg.hidden_size, ds, stride=ds,
                          padding=pad, bias=True), nn.SiLU())
        else:
            self.sampler = nn.Sequential(nn.AvgPool3d(ds), nn.SiLU())
        mods = [nn.Linear(cfg.hidden_size, cfg.hidden_size)]
        for _ in range(1, cfg.mlp_depth):
            mods += [nn.GELU(), nn.Linear(cfg.hidden_size, cfg.hidden_size)]
        self.readout = nn.Sequential(*mods)

    def forward(self, x):  # x: [b, t, n, d]
        b, t, n, d = x.shape
        hw = int(n ** 0.5)
        x = x.reshape(b, t, hw, hw, d).permute(0, 4, 1, 2, 3)  # b d t h w
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, d, hw, hw)
        if self.cfg.depth:
            x = self.s1(x)
        c = x.shape[1]
        x = x.reshape(b, t, c, hw, hw).permute(0, 2, 1, 3, 4)  # b c t h w
        x = self.sampler(x)
        nt = x.shape[2]
        c = x.shape[1]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * nt, c, x.shape[3], x.shape[4])
        if self.cfg.depth:
            x = self.s2(x)
        nh, nw = x.shape[2], x.shape[3]
        c = x.shape[1]
        x = x.reshape(b, nt, c, nh, nw).permute(0, 1, 3, 4, 2)
        x = x.reshape(b, nt * nh * nw, c)
        return self.readout(x)


def test_conv3d_torch_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 6, 5), dtype=np.float32)  # NTHWC
    w = rng.standard_normal((2, 2, 2, 5, 7), dtype=np.float32)  # DHWIO
    b = rng.standard_normal(7, dtype=np.float32)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            stride=(2, 2, 2), padding=1))
    wt = torch.tensor(w.transpose(4, 3, 0, 1, 2))  # OIDHW
    ref = torch.nn.functional.conv3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)), wt, torch.tensor(b),
        stride=(2, 2, 2), padding=1).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_depthwise_conv2d_torch_semantics():
    rng = np.random.default_rng(1)
    C = 6
    x = rng.standard_normal((2, 5, 5, C), dtype=np.float32)
    w = rng.standard_normal((3, 3, 1, C), dtype=np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1,
                            groups=C))
    wt = torch.tensor(w.transpose(3, 2, 0, 1))
    ref = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), wt, padding=1,
        groups=C).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_avgpool3d_torch_semantics():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 6, 6, 5), dtype=np.float32)
    got = np.asarray(avg_pool3d(jnp.asarray(x), (2, 2, 2)))
    ref = torch.nn.functional.avg_pool3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)),
        (2, 2, 2)).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ptype", ["stc_connector", "stc_connector_v35",
                                   "stp_connector", "spatial_conv",
                                   "spatial_pool"])
def test_connector_parity(ptype):
    torch.manual_seed(0)
    depth = 0 if ptype.startswith("spatial") else 2
    ds = (1, 2, 2) if ptype.startswith("spatial") else (2, 2, 2)
    # depth=0 connectors build the sampler with in_channels=hidden_size
    # (projector.py:164-174), so they require mm_hidden == hidden.
    mm_hidden = 32 if depth == 0 else 24
    cfg = ConnectorConfig(projector_type=ptype, mm_hidden_size=mm_hidden,
                          hidden_size=32, depth=depth, downsample=ds)
    ref_mod = TorchSTC(cfg).eval()
    params = connector_params_from_state_dict(ref_mod.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 16, mm_hidden), dtype=np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.tensor(x)).numpy()
    got = np.asarray(conn.apply(params, cfg, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_mlp_projector_parity():
    torch.manual_seed(0)
    cfg = ConnectorConfig(projector_type="mlp2x_gelu", mm_hidden_size=24,
                          hidden_size=32)
    ref_mod = nn.Sequential(nn.Linear(24, 32), nn.GELU(),
                            nn.Linear(32, 32)).eval()
    params = connector_params_from_state_dict(ref_mod.state_dict(), cfg,
                                              prefix="")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 24), dtype=np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.tensor(x)).numpy()
    got = np.asarray(conn.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
