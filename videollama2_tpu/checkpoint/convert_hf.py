"""HF checkpoint -> JAX param-tree conversion.

Covers every load path of the reference loader
(videollama2/model/__init__.py:48-193): full SFT checkpoints, pretrain-stage
`mm_projector.bin` adapters, and (via `train/lora.py`) LoRA deltas. Works from
either torch state_dicts or safetensors files; tensors may be torch.Tensor or
numpy arrays.

Kernel convention: JAX kernels are [in, out] = transpose of torch Linear
weights. Conv kernels convert from torch [O, I, *k] to JAX [*k, I, O].
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Dict, Iterable, Mapping

import numpy as np

from ..core import config as cfglib
from ..core.config import (ConnectorConfig, LLMConfig, ModelConfig,
                           VisionConfig)


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32/int numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t
    try:
        import torch
        if isinstance(t, torch.Tensor):
            t = t.detach()
            if t.dtype in (torch.bfloat16, torch.float16):
                t = t.to(torch.float32)
            return t.cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _t(sd: Mapping, key: str) -> np.ndarray:
    return _np(sd[key]).T


def _a(sd: Mapping, key: str) -> np.ndarray:
    return _np(sd[key])


def _stack(items: Iterable[np.ndarray]) -> np.ndarray:
    return np.stack(list(items), axis=0)


# ---------------------------------------------------------------------------
# LLM (Mistral / Qwen2 / Llama dense; Mixtral MoE)
# ---------------------------------------------------------------------------

def llm_params_from_state_dict(sd: Mapping, cfg: LLMConfig,
                               prefix: str = "model.") -> dict:
    """Convert an HF *ForCausalLM state_dict to the stacked-layer param tree.

    Key layout parity: HF MistralForCausalLM / Qwen2ForCausalLM /
    LlamaForCausalLM / MixtralForCausalLM.
    """
    L = cfg.num_layers

    def lkey(l, sub):
        return f"{prefix}layers.{l}.{sub}"

    layers: dict = {
        "attn_norm": {"scale": _stack(
            _a(sd, lkey(l, "input_layernorm.weight")) for l in range(L))},
        "mlp_norm": {"scale": _stack(
            _a(sd, lkey(l, "post_attention_layernorm.weight"))
            for l in range(L))},
        "q": {"kernel": _stack(
            _t(sd, lkey(l, "self_attn.q_proj.weight")) for l in range(L))},
        "k": {"kernel": _stack(
            _t(sd, lkey(l, "self_attn.k_proj.weight")) for l in range(L))},
        "v": {"kernel": _stack(
            _t(sd, lkey(l, "self_attn.v_proj.weight")) for l in range(L))},
        "o": {"kernel": _stack(
            _t(sd, lkey(l, "self_attn.o_proj.weight")) for l in range(L))},
    }
    if cfg.qkv_bias:
        for name in ("q", "k", "v"):
            layers[name]["bias"] = _stack(
                _a(sd, lkey(l, f"self_attn.{name}_proj.bias"))
                for l in range(L))
    if cfg.is_moe:
        E = cfg.num_experts
        layers["router"] = {"kernel": _stack(
            _t(sd, lkey(l, "block_sparse_moe.gate.weight"))
            for l in range(L))}
        layers["gate"] = {"kernel": _stack(
            _stack(_t(sd, lkey(l, f"block_sparse_moe.experts.{e}.w1.weight"))
                   for e in range(E)) for l in range(L))}
        layers["down"] = {"kernel": _stack(
            _stack(_t(sd, lkey(l, f"block_sparse_moe.experts.{e}.w2.weight"))
                   for e in range(E)) for l in range(L))}
        layers["up"] = {"kernel": _stack(
            _stack(_t(sd, lkey(l, f"block_sparse_moe.experts.{e}.w3.weight"))
                   for e in range(E)) for l in range(L))}
    else:
        layers["gate"] = {"kernel": _stack(
            _t(sd, lkey(l, "mlp.gate_proj.weight")) for l in range(L))}
        layers["up"] = {"kernel": _stack(
            _t(sd, lkey(l, "mlp.up_proj.weight")) for l in range(L))}
        layers["down"] = {"kernel": _stack(
            _t(sd, lkey(l, "mlp.down_proj.weight")) for l in range(L))}

    params = {
        "embed": {"weight": _a(sd, f"{prefix}embed_tokens.weight")},
        "layers": layers,
        "final_norm": {"scale": _a(sd, f"{prefix}norm.weight")},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(sd, "lm_head.weight")}
    return params


# ---------------------------------------------------------------------------
# Vision tower (CLIP / SigLIP)
# ---------------------------------------------------------------------------

def vision_params_from_state_dict(sd: Mapping, cfg: VisionConfig,
                                  prefix: str = "vision_model.") -> dict:
    """Convert HF CLIPVisionModel / SiglipVisionModel state_dict.

    HF layout (both families share encoder-layer naming):
      {prefix}embeddings.{patch,position}_embedding...
      {prefix}encoder.layers.{l}.{self_attn.{q,k,v,out}_proj,
                               layer_norm{1,2}, mlp.fc{1,2}}
      CLIP extras: embeddings.class_embedding, pre_layrnorm, post_layernorm
      SigLIP extras: post_layernorm (no CLS, no pre-LN)
    """
    L = cfg.num_layers

    def lkey(l, sub):
        return f"{prefix}encoder.layers.{l}.{sub}"

    layers = {
        "ln1": {"scale": _stack(_a(sd, lkey(l, "layer_norm1.weight"))
                                for l in range(L)),
                "bias": _stack(_a(sd, lkey(l, "layer_norm1.bias"))
                               for l in range(L))},
        "ln2": {"scale": _stack(_a(sd, lkey(l, "layer_norm2.weight"))
                                for l in range(L)),
                "bias": _stack(_a(sd, lkey(l, "layer_norm2.bias"))
                               for l in range(L))},
        "fc1": {"kernel": _stack(_t(sd, lkey(l, "mlp.fc1.weight"))
                                 for l in range(L)),
                "bias": _stack(_a(sd, lkey(l, "mlp.fc1.bias"))
                               for l in range(L))},
        "fc2": {"kernel": _stack(_t(sd, lkey(l, "mlp.fc2.weight"))
                                 for l in range(L)),
                "bias": _stack(_a(sd, lkey(l, "mlp.fc2.bias"))
                               for l in range(L))},
    }
    for name, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                     ("o", "out_proj")):
        layers[name] = {
            "kernel": _stack(_t(sd, lkey(l, f"self_attn.{hf}.weight"))
                             for l in range(L)),
            "bias": _stack(_a(sd, lkey(l, f"self_attn.{hf}.bias"))
                           for l in range(L)),
        }

    # torch Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
    patch_w = _a(sd, f"{prefix}embeddings.patch_embedding.weight")
    patch = {"kernel": np.transpose(patch_w, (2, 3, 1, 0))}
    if f"{prefix}embeddings.patch_embedding.bias" in sd:
        patch["bias"] = _a(sd, f"{prefix}embeddings.patch_embedding.bias")

    params = {
        "patch_embed": patch,
        "pos_embed": {"weight": _a(
            sd, f"{prefix}embeddings.position_embedding.weight")},
        "layers": layers,
        "post_ln": {"scale": _a(sd, f"{prefix}post_layernorm.weight"),
                    "bias": _a(sd, f"{prefix}post_layernorm.bias")},
    }
    if cfg.variant == "clip":
        params["cls_token"] = {"weight": _a(
            sd, f"{prefix}embeddings.class_embedding")}
        params["pre_ln"] = {"scale": _a(sd, f"{prefix}pre_layrnorm.weight"),
                            "bias": _a(sd, f"{prefix}pre_layrnorm.bias")}
    return params


# ---------------------------------------------------------------------------
# Connector (STC / STP / mlp / linear)
# ---------------------------------------------------------------------------

def _convnormact(sd: Mapping, prefix: str, ndim: int = 2) -> dict:
    """timm ConvNormAct: {prefix}.conv.weight + {prefix}.bn.{weight,bias}
    (norm is LayerNorm2d here, stored under 'bn')."""
    w = _a(sd, f"{prefix}.conv.weight")
    if ndim == 2:
        kernel = np.transpose(w, (2, 3, 1, 0))
    else:
        kernel = np.transpose(w, (2, 3, 4, 1, 0))
    p = {"conv": {"kernel": kernel}}
    if f"{prefix}.conv.bias" in sd:
        p["conv"]["bias"] = _a(sd, f"{prefix}.conv.bias")
    if f"{prefix}.bn.weight" in sd:
        p["norm"] = {"scale": _a(sd, f"{prefix}.bn.weight"),
                     "bias": _a(sd, f"{prefix}.bn.bias")}
    return p


def _regstage(sd: Mapping, prefix: str, depth: int) -> dict:
    """timm RegStage of `depth` Bottleneck blocks b1..bN
    (timm.models.regnet; reference projector.py:153-186)."""
    blocks = []
    for i in range(1, depth + 1):
        bp = f"{prefix}.b{i}"
        block = {
            "conv1": _convnormact(sd, f"{bp}.conv1"),
            "conv2": _convnormact(sd, f"{bp}.conv2"),
            "conv3": _convnormact(sd, f"{bp}.conv3"),
            "se": {
                "fc1": {"kernel": np.transpose(
                    _a(sd, f"{bp}.se.fc1.weight"), (2, 3, 1, 0)),
                        "bias": _a(sd, f"{bp}.se.fc1.bias")},
                "fc2": {"kernel": np.transpose(
                    _a(sd, f"{bp}.se.fc2.weight"), (2, 3, 1, 0)),
                        "bias": _a(sd, f"{bp}.se.fc2.bias")},
            },
        }
        if f"{bp}.downsample.conv.weight" in sd:
            block["downsample"] = _convnormact(sd, f"{bp}.downsample")
        blocks.append(block)
    return {f"b{i+1}": b for i, b in enumerate(blocks)}


def _mlp_seq(sd: Mapping, prefix: str, depth: int) -> dict:
    """nn.Sequential of Linear(+GELU) pairs: indices 0, 2, 4...
    (projector.py:125-130)."""
    base = prefix + "." if prefix else ""
    out = {}
    for d in range(depth):
        idx = 2 * d
        out[f"fc{d+1}"] = {"kernel": _t(sd, f"{base}{idx}.weight"),
                           "bias": _a(sd, f"{base}{idx}.bias")}
    return out


def connector_params_from_state_dict(sd: Mapping, cfg: ConnectorConfig,
                                     prefix: str = "") -> dict:
    pt = cfg.projector_type
    if pt == "linear":
        return {"fc1": {"kernel": _t(sd, f"{prefix}weight"),
                        "bias": _a(sd, f"{prefix}bias")}}
    m = re.match(r"^mlp(\d+)x_gelu$", pt)
    if m:
        return _mlp_seq(sd, prefix.rstrip("."), int(m.group(1)))
    if pt in ("stc_connector", "stc_connector_v35", "stp_connector",
              "spatial_conv", "spatial_pool"):
        params: dict = {}
        if cfg.depth != 0:
            params["s1"] = _regstage(sd, f"{prefix}s1", cfg.depth)
            params["s2"] = _regstage(sd, f"{prefix}s2", cfg.depth)
        if pt in ("stc_connector", "stc_connector_v35", "spatial_conv"):
            # sampler = Sequential(Conv3d, SiLU) -> index 0
            w = _a(sd, f"{prefix}sampler.0.weight")  # [O, I, kt, kh, kw]
            params["sampler"] = {
                "kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                "bias": _a(sd, f"{prefix}sampler.0.bias")}
        params["readout"] = _mlp_seq(sd, f"{prefix}readout", cfg.mlp_depth)
        return params
    if pt == "identity":
        return {}
    raise ValueError(f"Unknown projector type {pt}")


# ---------------------------------------------------------------------------
# Audio tower (BEATs, VideoLLaMA2.1-AV)
# ---------------------------------------------------------------------------

def audio_params_from_state_dict(sd: Mapping, cfg, prefix: str) -> dict:
    """Convert a torch BEATs state_dict (microsoft/unilm layout).

    Key map (BEATs.py): patch_embedding (Conv2d no-bias), layer_norm,
    post_extract_proj, encoder.pos_conv.0 (weight-normed Conv1d:
    weight_g/weight_v), encoder.layer_norm (post-norm backbone input LN),
    encoder.layers.{l}.self_attn.{q,k,v,out}_proj
    (k_proj bias-free), grep_linear (+ gru_rel_pos_const),
    relative_attention_bias (layer 0 only), self_attn_layer_norm /
    final_layer_norm, fc1/fc2.
    """
    L = cfg.num_layers

    def lk(l, s):
        return f"{prefix}encoder.layers.{l}.{s}"

    # weight-normed positional conv (fairseq: weight_norm(conv, dim=2) ->
    # weight_g [1, 1, K], norm over the size-1 axes of g); handle any dim
    # convention by reducing over whichever axes g broadcasts
    wg = _a(sd, f"{prefix}encoder.pos_conv.0.weight_g")
    wv = _a(sd, f"{prefix}encoder.pos_conv.0.weight_v")   # [D, D/g, K]
    axes = tuple(i for i, s in enumerate(wg.shape) if s == 1)
    norm = np.sqrt((wv ** 2).sum(axis=axes, keepdims=True))
    w = wg * wv / np.maximum(norm, 1e-8)
    pos_kernel = np.transpose(w, (2, 1, 0))               # [K, D/g, D]

    layers = {
        "q": {"kernel": _stack(_t(sd, lk(l, "self_attn.q_proj.weight"))
                               for l in range(L)),
              "bias": _stack(_a(sd, lk(l, "self_attn.q_proj.bias"))
                             for l in range(L))},
        "k": {"kernel": _stack(_t(sd, lk(l, "self_attn.k_proj.weight"))
                               for l in range(L))},
        "v": {"kernel": _stack(_t(sd, lk(l, "self_attn.v_proj.weight"))
                               for l in range(L)),
              "bias": _stack(_a(sd, lk(l, "self_attn.v_proj.bias"))
                             for l in range(L))},
        "o": {"kernel": _stack(_t(sd, lk(l, "self_attn.out_proj.weight"))
                               for l in range(L)),
              "bias": _stack(_a(sd, lk(l, "self_attn.out_proj.bias"))
                             for l in range(L))},
        "grep": {"kernel": _stack(
            _t(sd, lk(l, "self_attn.grep_linear.weight"))
            for l in range(L)),
                 "bias": _stack(_a(sd, lk(l, "self_attn.grep_linear.bias"))
                                for l in range(L))},
        "grep_a": _stack(_a(sd, lk(l, "self_attn.gru_rel_pos_const"))[0]
                         for l in range(L)),
        "ln1": {"scale": _stack(_a(sd, lk(l, "self_attn_layer_norm.weight"))
                                for l in range(L)),
                "bias": _stack(_a(sd, lk(l, "self_attn_layer_norm.bias"))
                               for l in range(L))},
        "ln2": {"scale": _stack(_a(sd, lk(l, "final_layer_norm.weight"))
                                for l in range(L)),
                "bias": _stack(_a(sd, lk(l, "final_layer_norm.bias"))
                               for l in range(L))},
        "fc1": {"kernel": _stack(_t(sd, lk(l, "fc1.weight"))
                                 for l in range(L)),
                "bias": _stack(_a(sd, lk(l, "fc1.bias")) for l in range(L))},
        "fc2": {"kernel": _stack(_t(sd, lk(l, "fc2.weight"))
                                 for l in range(L)),
                "bias": _stack(_a(sd, lk(l, "fc2.bias")) for l in range(L))},
    }
    pw = _a(sd, f"{prefix}patch_embedding.weight")        # [E, 1, 16, 16]
    return {
        "patch_embed": {"kernel": np.transpose(pw, (2, 3, 1, 0))},
        "pre_ln": {"scale": _a(sd, f"{prefix}layer_norm.weight"),
                   "bias": _a(sd, f"{prefix}layer_norm.bias")},
        "post_extract_proj": {
            "kernel": _t(sd, f"{prefix}post_extract_proj.weight"),
            "bias": _a(sd, f"{prefix}post_extract_proj.bias")},
        "pos_conv": {"kernel": pos_kernel,
                     "bias": _a(sd, f"{prefix}encoder.pos_conv.0.bias")},
        # fairseq backbone's input LN (layer_norm_first=False)
        "enc_ln": {"scale": _a(sd, f"{prefix}encoder.layer_norm.weight"),
                   "bias": _a(sd, f"{prefix}encoder.layer_norm.bias")},
        # nn.Embedding(num_buckets, num_heads): [320, H], no transpose
        "rel_embed": _a(
            sd, f"{prefix}encoder.layers.0.self_attn."
                "relative_attention_bias.weight"),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Whole-model assembly from a checkpoint directory
# ---------------------------------------------------------------------------

def load_state_dict_from_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all safetensors/bin shards in an HF checkpoint directory."""
    sd: Dict[str, np.ndarray] = {}
    fns = sorted(os.listdir(path))
    st_files = [f for f in fns if f.endswith(".safetensors")
                and not f.endswith(".index.json")]
    if st_files:
        from safetensors import safe_open
        for fn in st_files:
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = [f for f in fns if f.startswith("pytorch_model")
            and f.endswith(".bin")]
    if bins:
        import torch
        for fn in bins:
            part = torch.load(os.path.join(path, fn), map_location="cpu",
                              weights_only=True)
            sd.update({k: _np(v) for k, v in part.items()})
        return sd
    raise FileNotFoundError(f"No model weights found in {path}")


def model_config_from_hf(cfg_json: dict) -> ModelConfig:
    """Build a ModelConfig from a videollama2 checkpoint's config.json."""
    mt = cfg_json.get("model_type", "videollama2_mistral")
    if not mt.startswith("videollama2"):
        mt = "videollama2_" + {"mistral": "mistral", "qwen2": "qwen2",
                               "mixtral": "mixtral", "llama": "llama"}[mt]
    if mt == "videollama2":  # v1 checkpoints use bare 'videollama2' (mistral)
        mt = "videollama2_mistral"
    base = cfglib.preset(mt)
    llm = base.llm
    llm_fields = dict(
        vocab_size=cfg_json.get("vocab_size", llm.vocab_size),
        hidden_size=cfg_json.get("hidden_size", llm.hidden_size),
        intermediate_size=cfg_json.get("intermediate_size",
                                       llm.intermediate_size),
        num_layers=cfg_json.get("num_hidden_layers", llm.num_layers),
        num_heads=cfg_json.get("num_attention_heads", llm.num_heads),
        num_kv_heads=cfg_json.get("num_key_value_heads", llm.num_kv_heads),
        rope_theta=cfg_json.get("rope_theta", llm.rope_theta),
        rms_norm_eps=cfg_json.get("rms_norm_eps", llm.rms_norm_eps),
        max_position_embeddings=cfg_json.get("max_position_embeddings",
                                             llm.max_position_embeddings),
        sliding_window=cfg_json.get("sliding_window", llm.sliding_window),
        tie_word_embeddings=cfg_json.get("tie_word_embeddings", False),
        bos_token_id=cfg_json.get("bos_token_id", llm.bos_token_id),
        eos_token_id=_first(cfg_json.get("eos_token_id", llm.eos_token_id)),
        pad_token_id=cfg_json.get("pad_token_id") or llm.pad_token_id,
    )
    llm_fields["head_dim"] = cfg_json.get(
        "head_dim", llm_fields["hidden_size"] // llm_fields["num_heads"])
    if cfg_json.get("num_local_experts"):
        llm_fields["num_experts"] = cfg_json["num_local_experts"]
        llm_fields["num_experts_per_tok"] = cfg_json.get(
            "num_experts_per_tok", 2)
    llm = dataclasses.replace(llm, **llm_fields)

    tower = cfg_json.get("mm_vision_tower", "")
    vision = (cfglib.siglip_so400m_384() if "siglip" in tower
              else cfglib.clip_vit_l_336())
    if "tiny_test_vision" in cfg_json:  # test fixtures carry explicit dims
        tv = cfg_json["tiny_test_vision"]
        vision = dataclasses.replace(
            vision, image_size=tv["image_size"], patch_size=tv["patch_size"],
            hidden_size=tv["hidden_size"],
            intermediate_size=tv["intermediate_size"],
            num_layers=tv["num_layers"], num_heads=tv["num_heads"])
    if "mm_vision_select_layer" in cfg_json:
        vision = dataclasses.replace(
            vision, select_layer=cfg_json["mm_vision_select_layer"])
    conn = ConnectorConfig(
        projector_type=cfg_json.get("mm_projector_type", "stc_connector"),
        mm_hidden_size=cfg_json.get("mm_hidden_size", vision.hidden_size),
        hidden_size=llm.hidden_size,
        # reference STC depth is fixed at 4 (projector.py:135); test fixtures
        # may override
        depth=cfg_json.get("mm_connector_depth", 4))
    audio = None
    if any(k in cfg_json for k in ("mm_audio_tower", "audio_tower")) or \
            "av" in cfg_json.get("model_type", ""):
        from ..core.config import AudioConfig
        audio = AudioConfig()
    return ModelConfig(model_type=mt, llm=llm, vision=vision, connector=conn,
                       audio=audio,
                       num_frames=cfg_json.get("num_frames", 8))


def _first(x):
    return x[0] if isinstance(x, (list, tuple)) else x


def model_config_to_hf(cfg: ModelConfig) -> dict:
    """Inverse of model_config_from_hf: emit a config.json dict in the
    reference's HF layout (videollama2_arch.py:49,64-68 mm_* stamping) so
    checkpoints written by this framework round-trip through both loaders."""
    llm = cfg.llm
    arch = {"videollama2_mistral": "Videollama2MistralForCausalLM",
            "videollama2_qwen2": "Videollama2Qwen2ForCausalLM",
            "videollama2_mixtral": "Videollama2MixtralForCausalLM",
            "videollama2_llama": "Videollama2LlamaForCausalLM",
            }.get(cfg.model_type, "Videollama2MistralForCausalLM")
    out = {
        "model_type": cfg.model_type,
        "architectures": [arch],
        "vocab_size": llm.vocab_size,
        "hidden_size": llm.hidden_size,
        "intermediate_size": llm.intermediate_size,
        "num_hidden_layers": llm.num_layers,
        "num_attention_heads": llm.num_heads,
        "num_key_value_heads": llm.num_kv_heads,
        "head_dim": llm.head_dim,
        "rope_theta": llm.rope_theta,
        "rms_norm_eps": llm.rms_norm_eps,
        "max_position_embeddings": llm.max_position_embeddings,
        "sliding_window": llm.sliding_window,
        "tie_word_embeddings": llm.tie_word_embeddings,
        "bos_token_id": llm.bos_token_id,
        "eos_token_id": llm.eos_token_id,
        "pad_token_id": llm.pad_token_id,
        "mm_projector_type": cfg.connector.projector_type,
        "mm_hidden_size": cfg.connector.mm_hidden_size,
        "mm_vision_tower": ("siglip-so400m-patch14-384"
                            if cfg.vision.variant == "siglip"
                            else "clip-vit-large-patch14-336"),
        "mm_vision_select_layer": cfg.vision.select_layer,
        "mm_vision_select_feature": "patch",
        "num_frames": cfg.num_frames,
    }
    if llm.is_moe:
        out["num_local_experts"] = llm.num_experts
        out["num_experts_per_tok"] = llm.num_experts_per_tok
    if cfg.connector.depth != 4:
        out["mm_connector_depth"] = cfg.connector.depth
    # tiny test-fixture towers carry explicit dims for round-tripping
    if cfg.vision.image_size not in (336, 384):
        v = cfg.vision
        out["tiny_test_vision"] = {
            "image_size": v.image_size, "patch_size": v.patch_size,
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_layers": v.num_layers, "num_heads": v.num_heads}
    return out


def videollama2_params_from_state_dict(sd: Mapping, cfg: ModelConfig) -> dict:
    """Full checkpoint: model.* (LLM), model.vision_tower.vision_tower.* ,
    model.mm_projector.* (reference save layout); AV checkpoints add
    model.audio_tower.* + model.mm_projector_a.*."""
    params = {
        "llm": llm_params_from_state_dict(sd, cfg.llm, prefix="model."),
        "vision": vision_params_from_state_dict(
            sd, cfg.vision,
            prefix="model.vision_tower.vision_tower.vision_model."),
        "connector": connector_params_from_state_dict(
            sd, cfg.connector, prefix="model.mm_projector."),
    }
    if cfg.audio is not None:
        import warnings
        for enc_prefix in ("model.audio_tower.audio_tower.",
                           "model.audio_tower."):
            if f"{enc_prefix}patch_embedding.weight" in sd:
                params["audio"] = {
                    "encoder": audio_params_from_state_dict(
                        sd, cfg.audio, prefix=enc_prefix),
                    "projector": _mlp_seq(sd, "model.mm_projector_a", 2),
                }
                break
        else:
            import jax
            import jax.numpy as jnp
            from ..models import beats as beats_lib
            from ..models import connector as conn_lib
            warnings.warn("AV config but no audio tower weights found; "
                          "audio branch randomly initialized")
            rng = jax.random.PRNGKey(0)
            params["audio"] = {
                "encoder": beats_lib.init_params(rng, cfg.audio),
                "projector": conn_lib._init_mlp(
                    rng, 2, cfg.audio.encoder_dim, cfg.llm.hidden_size,
                    jnp.float32),
            }
    return params


def load_videollama2(path: str, model_base: str = None,
                     vision_tower_path: str = None):
    """Load a VideoLLaMA2 checkpoint directory — all four reference paths
    (model/__init__.py:48-193):

      (a) LoRA dir (adapter_model.* + non_lora_trainables.bin) + model_base:
          base LLM weights, projector from non-LoRA trainables, LoRA deltas
          merged into the base kernels;
      (b) pretrain dir (mm_projector.bin) + model_base: base LLM + converted
          projector, vision tower from `vision_tower_path` or random;
      (c) full SFT checkpoint: everything from the one directory;
      (d) plain LLM checkpoint: falls back to (c) shapes minus mm modules.

    Returns (ModelConfig, params dict).
    """
    with open(os.path.join(path, "config.json")) as f:
        cfg_json = json.load(f)
    cfg = model_config_from_hf(cfg_json)
    files = set(os.listdir(path))
    is_lora = any(f.startswith("adapter_model") for f in files)
    is_pretrain = "mm_projector.bin" in files and not any(
        f.endswith(".safetensors") or f.startswith("pytorch_model")
        for f in files)

    def _vision_params():
        if vision_tower_path:
            vsd = load_state_dict_from_dir(vision_tower_path)
            return vision_params_from_state_dict(vsd, cfg.vision,
                                                 prefix="vision_model.")
        import warnings
        import jax
        from ..models import vit as vit_lib
        warnings.warn("vision tower weights unavailable offline; "
                      "randomly initialized — pass vision_tower_path")
        return vit_lib.init_params(jax.random.PRNGKey(0), cfg.vision)

    if is_lora:
        # (a) model/__init__.py:88-137
        assert model_base, "LoRA checkpoints need model_base"
        base_sd = load_state_dict_from_dir(model_base)
        llm = llm_params_from_state_dict(base_sd, cfg.llm, prefix="model.")
        import torch
        non_lora_path = os.path.join(path, "non_lora_trainables.bin")
        if os.path.exists(non_lora_path):
            nl = torch.load(non_lora_path, map_location="cpu",
                            weights_only=True)
            nl = {(k[len("base_model.model."):] if
                   k.startswith("base_model.model.") else k): v
                  for k, v in nl.items()}
            connector = connector_params_from_state_dict(
                nl, cfg.connector, prefix="model.mm_projector.")
        else:
            from ..models import connector as conn_lib
            import jax
            connector = conn_lib.init_params(jax.random.PRNGKey(0),
                                             cfg.connector)
        # merge LoRA deltas
        adapter_file = next(f for f in files if f.startswith("adapter_model"))
        if adapter_file.endswith(".safetensors"):
            from safetensors import safe_open
            asd = {}
            with safe_open(os.path.join(path, adapter_file),
                           framework="np") as f:
                for k in f.keys():
                    asd[k] = f.get_tensor(k)
        else:
            asd = torch.load(os.path.join(path, adapter_file),
                             map_location="cpu", weights_only=True)
            asd = {k: _np(v) for k, v in asd.items()}
        from ..train import lora as lora_lib
        acfg_path = os.path.join(path, "adapter_config.json")
        r, alpha = 128, 256
        if os.path.exists(acfg_path):
            with open(acfg_path) as f:
                ac = json.load(f)
            r, alpha = ac.get("r", r), ac.get("lora_alpha", alpha)
        lcfg = lora_lib.LoraConfig(r=r, alpha=alpha)
        adapters = lora_lib.lora_params_from_peft_state_dict(asd, cfg.llm,
                                                             lcfg)
        llm = lora_lib.apply_lora(llm, adapters, lcfg)
        params = {"llm": llm, "vision": _vision_params(),
                  "connector": connector}
        return cfg, params

    if is_pretrain:
        # (b) model/__init__.py:138-164
        assert model_base, "pretrain-stage checkpoints need model_base"
        base_sd = load_state_dict_from_dir(model_base)
        params = {
            "llm": llm_params_from_state_dict(base_sd, cfg.llm,
                                              prefix="model."),
            "vision": _vision_params(),
            "connector": load_pretrain_adapter(path, cfg.connector),
        }
        return cfg, params

    # (c)/(d) full checkpoint
    sd = load_state_dict_from_dir(path)
    params = videollama2_params_from_state_dict(sd, cfg)
    return cfg, params


def load_pretrain_adapter(path: str, cfg: ConnectorConfig) -> dict:
    """Load a pretrain-stage `mm_projector.bin` (model/__init__.py:138-164)."""
    import torch
    sd = torch.load(os.path.join(path, "mm_projector.bin"),
                    map_location="cpu", weights_only=True)
    sd = {k: _np(v) for k, v in sd.items()}
    return connector_params_from_state_dict(sd, cfg,
                                            prefix="model.mm_projector.")
