"""Build a tiny random VideoLLaMA2 checkpoint in the reference's HF format.

Produces a directory with config.json, model.safetensors (reference key
layout: model.*, model.vision_tower.vision_tower.*, model.mm_projector.*) and
a real offline-built tokenizer with a Mistral-style chat template — enough to
drive the full public API (`model_init` / `mm_infer`) end-to-end without
network access. Used by the e2e smoke test and the verify flow.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


MISTRAL_CHAT_TEMPLATE = (
    "{{ bos_token }}{% for message in messages %}"
    "{% if message['role'] == 'system' %}{{ message['content'] }}"
    "{% elif message['role'] == 'user' %}[INST] {{ message['content'] }} [/INST]"
    "{% elif message['role'] == 'assistant' %}{{ message['content'] }}{{ eos_token }}"
    "{% endif %}{% endfor %}")


def build_tokenizer(save_dir: str, vocab_size: int):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    words = {"<unk>": 0, "<s>": 1, "</s>": 2}
    # byte-level-ish word vocab over simple english words + punctuation
    base = ("the a cat dog video image shows in on is was what happens why "
            "how answer question scene person object moving play jump run "
            "describe briefly detail first then finally yes no <video> "
            "<image> <audio>").split()
    for w in base:
        words.setdefault(w, len(words))
    i = 0
    while len(words) < vocab_size - 1:
        words.setdefault(f"tok{i}", len(words))
        i += 1
    tok = Tokenizer(models.WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<unk>")
    fast.chat_template = MISTRAL_CHAT_TEMPLATE
    fast.save_pretrained(save_dir)


def build_checkpoint(save_dir: str, size: str = "tiny"):
    """size='tiny' (unit tests) or '1b' (~1.1B LLM + tiny tower — big
    enough that TPU serving benchmarks measure real decode bandwidth,
    small enough to build on one host core in ~a minute)."""
    import dataclasses
    import torch
    import transformers
    from safetensors.numpy import save_file

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_connector_parity import TorchSTC

    from videollama2_tpu.core import config as cfglib

    cfg = cfglib.tiny_model("videollama2_mistral", "stc_connector_v35")
    if size == "1b":
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(
            cfg.llm, hidden_size=2048, intermediate_size=5632,
            num_layers=22, num_heads=16, num_kv_heads=4, head_dim=128,
            vocab_size=32000))
    os.makedirs(save_dir, exist_ok=True)
    torch.manual_seed(0)

    lc = cfg.llm
    hf_llm = transformers.MistralForCausalLM(transformers.MistralConfig(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_layers, num_attention_heads=lc.num_heads,
        num_key_value_heads=lc.num_kv_heads, head_dim=lc.head_dim,
        rope_theta=lc.rope_theta, rms_norm_eps=lc.rms_norm_eps,
        sliding_window=None))
    vc = cfg.vision
    hf_vit = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        hidden_size=vc.hidden_size, intermediate_size=vc.intermediate_size,
        num_hidden_layers=vc.num_layers, num_attention_heads=vc.num_heads,
        image_size=vc.image_size, patch_size=vc.patch_size,
        hidden_act=vc.hidden_act))
    stc = TorchSTC(cfg.connector)

    sd = {}
    for k, v in hf_llm.state_dict().items():
        sd[k] = v.numpy()
    for k, v in hf_vit.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v.numpy()
    for k, v in stc.state_dict().items():
        sd[f"model.mm_projector.{k}"] = v.numpy()
    save_file(sd, os.path.join(save_dir, "model.safetensors"))

    config_json = {
        "model_type": "videollama2_mistral",
        "architectures": ["Videollama2MistralForCausalLM"],
        "vocab_size": lc.vocab_size, "hidden_size": lc.hidden_size,
        "intermediate_size": lc.intermediate_size,
        "num_hidden_layers": lc.num_layers,
        "num_attention_heads": lc.num_heads,
        "num_key_value_heads": lc.num_kv_heads,
        "head_dim": lc.head_dim,
        "rope_theta": lc.rope_theta, "rms_norm_eps": lc.rms_norm_eps,
        "max_position_embeddings": lc.max_position_embeddings,
        "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
        "mm_projector_type": cfg.connector.projector_type,
        "mm_hidden_size": cfg.connector.mm_hidden_size,
        "mm_vision_tower": "tiny-clip-test",
        "mm_vision_select_layer": -2,
        "mm_vision_select_feature": "patch",
        "mm_connector_depth": cfg.connector.depth,
        "num_frames": cfg.num_frames,
        "tiny_test_vision": {
            "image_size": vc.image_size, "patch_size": vc.patch_size,
            "hidden_size": vc.hidden_size,
            "intermediate_size": vc.intermediate_size,
            "num_layers": vc.num_layers, "num_heads": vc.num_heads,
        },
    }
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config_json, f, indent=2)
    build_tokenizer(save_dir, lc.vocab_size)
    return save_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tiny_vllama2_ckpt")
    ap.add_argument("--size", default="tiny", choices=["tiny", "1b"])
    args = ap.parse_args()
    print(build_checkpoint(args.out, size=args.size))
