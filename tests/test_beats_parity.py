"""BEATs encoder parity vs a torch replica (same architecture, torch ops).

Validates the audio converter's key mapping / transposes / weight-norm math
and the JAX forward against an independent torch implementation of the same
WavLM-style gated-relative-position-bias encoder.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from videollama2_tpu.core.config import AudioConfig
from videollama2_tpu.checkpoint.convert_hf import audio_params_from_state_dict
from videollama2_tpu.models import beats as jbeats


class TorchGatedAttention(nn.Module):
    def __init__(self, dim, heads, has_rel=False, buckets=320, max_dist=800):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim)
        self.out_proj = nn.Linear(dim, dim)
        self.grep_linear = nn.Linear(self.hd, 8)
        self.gru_rel_pos_const = nn.Parameter(torch.ones(1, heads, 1, 1))
        if has_rel:
            self.relative_attention_bias = nn.Embedding(buckets, heads)
        self.buckets = buckets
        self.max_dist = max_dist

    def pos_bias(self, S):
        ctx = torch.arange(S)[:, None]
        mem = torch.arange(S)[None, :]
        rel = mem - ctx
        nb = self.buckets // 2
        ret = (rel > 0).long() * nb
        n = rel.abs()
        max_exact = nb // 2
        large = max_exact + (
            torch.log(n.float() / max_exact + 1e-9)
            / math.log(self.max_dist / max_exact) * (nb - max_exact)).long()
        large = torch.minimum(large, torch.tensor(nb - 1))
        buckets = ret + torch.where(n < max_exact, n, large)
        return self.relative_attention_bias(buckets).permute(2, 0, 1)

    def forward(self, x, pos_bias):
        B, S, D = x.shape
        H, hd = self.heads, self.hd
        q = self.q_proj(x).view(B, S, H, hd)
        k = self.k_proj(x).view(B, S, H, hd)
        v = self.v_proj(x).view(B, S, H, hd)
        g = self.grep_linear(q).view(B, S, H, 2, 4).sum(-1)
        gates = torch.sigmoid(g)
        gate_a, gate_b = gates[..., 0], gates[..., 1]
        grep_a = self.gru_rel_pos_const[0, :, 0, 0]
        gate_a_1 = gate_a * (gate_b * grep_a[None, None] - 1.0) + 2.0
        bias = gate_a_1.permute(0, 2, 1)[..., None] * pos_bias[None]
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        logits = logits + bias
        probs = torch.softmax(logits, dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, D)
        return self.out_proj(out)


class TorchBeats(nn.Module):
    def __init__(self, cfg: AudioConfig):
        super().__init__()
        self.cfg = cfg
        E, D = cfg.embed_dim, cfg.encoder_dim
        self.patch_embedding = nn.Conv2d(1, E, 16, 16, bias=False)
        self.layer_norm = nn.LayerNorm(E, eps=cfg.layer_norm_eps)
        self.post_extract_proj = nn.Linear(E, D)

        conv = nn.Conv1d(D, D, cfg.conv_pos, padding=cfg.conv_pos // 2,
                         groups=cfg.conv_pos_groups)
        conv = nn.utils.weight_norm(conv, name="weight", dim=2)

        class Enc(nn.Module):
            pass
        self.encoder = Enc()
        self.encoder.pos_conv = nn.Sequential(conv)
        # fairseq backbone input LN (layer_norm_first=False)
        self.encoder.layer_norm = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
        layers = []
        for l in range(cfg.num_layers):
            layer = nn.Module()
            layer.self_attn = TorchGatedAttention(D, cfg.num_heads,
                                                  has_rel=(l == 0))
            layer.self_attn_layer_norm = nn.LayerNorm(D,
                                                      eps=cfg.layer_norm_eps)
            layer.final_layer_norm = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            layer.fc1 = nn.Linear(D, cfg.intermediate_size)
            layer.fc2 = nn.Linear(cfg.intermediate_size, D)
            layers.append(layer)
        self.encoder.layers = nn.ModuleList(layers)

    def forward(self, fbank):
        cfg = self.cfg
        x = self.patch_embedding(fbank.unsqueeze(1))  # [B, E, T/16, 8]
        B, E = x.shape[0], x.shape[1]
        x = x.reshape(B, E, -1).transpose(1, 2)
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        pos = self.encoder.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        if cfg.conv_pos % 2 == 0:
            pos = pos[:, :-1]
        x = x + torch.nn.functional.gelu(pos[:, :x.shape[1]])
        x = self.encoder.layer_norm(x)
        S = x.shape[1]
        pos_bias = self.encoder.layers[0].self_attn.pos_bias(S)
        alpha = (2 * cfg.num_layers) ** 0.25
        for layer in self.encoder.layers:
            attn = layer.self_attn(x, pos_bias)
            x = layer.self_attn_layer_norm(x * alpha + attn)
            h = layer.fc2(torch.nn.functional.gelu(layer.fc1(x)))
            x = layer.final_layer_norm(x * alpha + h)
        return x


def _beats_iter3_key_manifest(prefix="model.audio_tower."):
    """The published BEATs_iter3+(AS2M)(cpt2) state-dict key layout as it
    rides inside the VideoLLaMA2.1-7B-AV checkpoint (reference
    README.md:130-132; architecture: microsoft/unilm BEATs backbone,
    layer_norm_first=False, gru_rel_pos, deep_norm, E=512 D=768 L=12 H=12
    F=3072 conv_pos=128 groups=16). Shapes derive from the config; values
    are zeros — this pins NAMES so converter drift fails loudly."""
    E, D, L, H, F, K, G = 512, 768, 12, 12, 3072, 128, 16
    keys = {
        f"{prefix}patch_embedding.weight": (E, 1, 16, 16),
        f"{prefix}layer_norm.weight": (E,),
        f"{prefix}layer_norm.bias": (E,),
        f"{prefix}post_extract_proj.weight": (D, E),
        f"{prefix}post_extract_proj.bias": (D,),
        f"{prefix}encoder.pos_conv.0.bias": (D,),
        f"{prefix}encoder.pos_conv.0.weight_g": (1, 1, K),
        f"{prefix}encoder.pos_conv.0.weight_v": (D, D // G, K),
        f"{prefix}encoder.layer_norm.weight": (D,),
        f"{prefix}encoder.layer_norm.bias": (D,),
    }
    for l in range(L):
        p = f"{prefix}encoder.layers.{l}."
        keys.update({
            f"{p}self_attn.q_proj.weight": (D, D),
            f"{p}self_attn.q_proj.bias": (D,),
            f"{p}self_attn.k_proj.weight": (D, D),   # k_proj: bias=False
            f"{p}self_attn.v_proj.weight": (D, D),
            f"{p}self_attn.v_proj.bias": (D,),
            f"{p}self_attn.out_proj.weight": (D, D),
            f"{p}self_attn.out_proj.bias": (D,),
            f"{p}self_attn.grep_linear.weight": (8, D // H),
            f"{p}self_attn.grep_linear.bias": (8,),
            f"{p}self_attn.gru_rel_pos_const": (1, H, 1, 1),
            # BEATs shares layer 0's relative_attention_bias module by
            # reference across all layers, so EVERY layer serializes the
            # (identical) embedding; the converter reads layer 0's
            f"{p}self_attn.relative_attention_bias.weight": (320, H),
            f"{p}self_attn_layer_norm.weight": (D,),
            f"{p}self_attn_layer_norm.bias": (D,),
            f"{p}final_layer_norm.weight": (D,),
            f"{p}final_layer_norm.bias": (D,),
            f"{p}fc1.weight": (F, D),
            f"{p}fc1.bias": (F,),
            f"{p}fc2.weight": (D, F),
            f"{p}fc2.bias": (D,),
        })
    return keys


def test_beats_av_checkpoint_key_manifest():
    """Dry-run the AV audio converter against the pinned BEATs-iter3 key
    manifest (VERDICT r2 #9): every manifest key must be consumed (or be a
    known shared-module duplicate) and the converted tree must match
    models.beats.init_params leaf-for-leaf in structure and shape — a
    naming/shape drift in either direction fails here without weights."""
    cfg = AudioConfig()  # released geometry: E=512 D=768 L=12 H=12 F=3072

    class RecordingDict(dict):
        def __init__(self, *a):
            super().__init__(*a)
            self.read = set()

        def __getitem__(self, k):
            self.read.add(k)
            return super().__getitem__(k)

        def __contains__(self, k):
            return super().__contains__(k)

    manifest = _beats_iter3_key_manifest()
    sd = RecordingDict({k: torch.zeros(s) for k, s in manifest.items()})
    params = audio_params_from_state_dict(sd, cfg,
                                          prefix="model.audio_tower.")

    # rel-bias is shared across layers: only layer 0's copy need be read
    allowed_unread = {
        f"model.audio_tower.encoder.layers.{l}.self_attn."
        "relative_attention_bias.weight" for l in range(1, cfg.num_layers)}
    unread = set(manifest) - sd.read - allowed_unread
    assert not unread, f"manifest keys never consumed: {sorted(unread)}"

    ref = jbeats.init_params(jax.random.PRNGKey(0), cfg)
    got_tree = jax.tree.structure(jax.tree.map(np.shape, params))
    ref_tree = jax.tree.structure(jax.tree.map(np.shape, ref))
    assert got_tree == ref_tree
    got_shapes = jax.tree.leaves(jax.tree.map(np.shape, params))
    ref_shapes = jax.tree.leaves(jax.tree.map(np.shape, ref))
    assert got_shapes == ref_shapes


def test_beats_torch_parity():
    torch.manual_seed(0)
    cfg = AudioConfig(embed_dim=24, encoder_dim=32, num_layers=2,
                      num_heads=4, intermediate_size=64, conv_pos=8,
                      conv_pos_groups=4, max_frames=64)
    ref = TorchBeats(cfg).eval()
    # patch up reshape mismatch: torch conv output is [B,E,T',F'] flattened
    # as E-major; the JAX NHWC path flattens T'/F'-major. Use the state
    # dict through the real converter and compare end to end.
    sd = ref.state_dict()
    # weight_norm modern naming: parametrizations... normalize names
    fixed = {}
    for k, v in sd.items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        fixed[k] = v
    params = audio_params_from_state_dict(fixed, cfg, prefix="")

    rng = np.random.default_rng(0)
    fb = rng.standard_normal((2, cfg.max_frames, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(fb)).numpy()
    got = np.asarray(jbeats.forward(params, cfg, jax.numpy.asarray(fb)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
