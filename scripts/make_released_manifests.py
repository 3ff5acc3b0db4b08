"""Vendor released-checkpoint key/shape manifests (VERDICT r3 #8).

Builds the full safetensors key -> shape manifest of the released
VideoLLaMA2-7B-16F and VideoLLaMA2.1-7B-AV checkpoints (reference model zoo,
README.md:115-132) from their published geometry — torch modules on the
`meta` device give names+shapes without allocating 7B parameters — and
writes them to tests/fixtures/manifests/*.json. The converter dry-run test
(tests/test_released_manifests.py) then fails on any unmapped key or shape
drift, entirely offline.

Key layout parity: the reference saves the composite model as one HF tree —
model.* (LLM), model.vision_tower.vision_tower.* (HF vision model),
model.mm_projector.* (STC), and for AV model.audio_tower.* +
model.mm_projector_a.* (reference videollama2/model/__init__.py:88-179,
videollama2_arch.py save layout).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch
import transformers

OUT_DIR = os.path.join(REPO, "tests", "fixtures", "manifests")


def _sd_shapes(module, prefix):
    return {prefix + k: list(v.shape) for k, v in module.state_dict().items()}


def mistral_7b_16f():
    from test_connector_parity import TorchSTC
    from videollama2_tpu.core import config as cfglib

    cfg = cfglib.preset("videollama2_mistral")
    with torch.device("meta"):
        llm = transformers.MistralForCausalLM(transformers.MistralConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, head_dim=128, sliding_window=None))
        vit = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
            hidden_act="quick_gelu"))
        stc = TorchSTC(cfg.connector)
    keys = {}
    keys.update(_sd_shapes(llm, ""))  # model.* + lm_head.*
    keys.update(_sd_shapes(vit, "model.vision_tower.vision_tower."))
    keys.update(_sd_shapes(stc, "model.mm_projector."))
    return keys


def qwen2_av_7b():
    from test_beats_parity import _beats_iter3_key_manifest
    from test_connector_parity import TorchSTC
    from videollama2_tpu.core import config as cfglib

    cfg = cfglib.preset("videollama2_qwen2_av")
    with torch.device("meta"):
        llm = transformers.Qwen2ForCausalLM(transformers.Qwen2Config(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, head_dim=128, tie_word_embeddings=False))
        vit = transformers.SiglipVisionModel(transformers.SiglipVisionConfig(
            hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
            num_attention_heads=16, image_size=384, patch_size=14,
            hidden_act="gelu_pytorch_tanh"))
        stc = TorchSTC(cfg.connector)
        proj_a = torch.nn.Sequential(
            torch.nn.Linear(cfg.audio.encoder_dim, cfg.llm.hidden_size),
            torch.nn.GELU(),
            torch.nn.Linear(cfg.llm.hidden_size, cfg.llm.hidden_size))
    keys = {}
    keys.update(_sd_shapes(llm, ""))
    keys.update(_sd_shapes(vit, "model.vision_tower.vision_tower."))
    keys.update(_sd_shapes(stc, "model.mm_projector."))
    keys.update({k: list(s) for k, s in
                 _beats_iter3_key_manifest("model.audio_tower.").items()})
    keys.update(_sd_shapes(proj_a, "model.mm_projector_a."))
    return keys


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in (("videollama2_7b_16f", mistral_7b_16f),
                     ("videollama2_1_7b_av", qwen2_av_7b)):
        keys = fn()
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(keys, f, indent=0, sort_keys=True)
        total = 0
        for s in keys.values():
            n = 1
            for d in s:
                n *= d
            total += n
        print(f"{path}: {len(keys)} keys, {total/1e9:.2f}B params")


if __name__ == "__main__":
    main()
