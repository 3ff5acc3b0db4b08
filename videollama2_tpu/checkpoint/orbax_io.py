"""Orbax checkpointing: train-state save/restore with auto-resume.

Replaces the reference's three save shapes (videollama2_trainer.py:320-361,
91-125; SURVEY.md §5 checkpoint/resume):
  (a) full train-state checkpoints with step-numbered directories and
      auto-resume from the latest (train.py:552-557);
  (b) projector-only `mm_projector.bin`-equivalent adapters for the pretrain
      stage (tune_mm_mlp_adapter);
  (c) LoRA split saves (train/lora.py handles the param split).

Also exports back to the HF/torch key layout so checkpoints interoperate
with the reference ecosystem.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))


def save_train_state(directory: str, step: int, state: Any,
                     max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp
    mgr = _mgr(os.path.abspath(directory), max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(os.path.abspath(directory))
    return mgr.latest_step()


def restore_train_state(directory: str, abstract_state: Any,
                        step: Optional[int] = None) -> Any:
    """Restore into the sharding/layout of `abstract_state` (auto-resume:
    pass step=None for the latest, parity train.py:554-557)."""
    import orbax.checkpoint as ocp
    mgr = _mgr(os.path.abspath(directory))
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    restored = mgr.restore(step,
                           args=ocp.args.StandardRestore(abstract_state))

    # Re-pin every leaf to the template's sharding: StandardRestore leaves
    # scalar/replicated leaves (e.g. optax `count`) on a single device,
    # which poisons the next jitted train step with mixed device sets
    # ("incompatible devices" — caught by the preemption-resume test; the
    # plain resume test never stepped after restoring).
    def _repin(template, leaf):
        if hasattr(template, "sharding") and hasattr(leaf, "sharding") \
                and leaf.sharding != template.sharding:
            return jax.device_put(leaf, template.sharding)
        return leaf
    return jax.tree.map(_repin, abstract_state, restored)


def save_projector_only(directory: str, connector_params: Any) -> None:
    """Pretrain-stage adapter save — the `mm_projector.bin` equivalent
    (videollama2_trainer.py:320-341). Written as numpy npz + manifest."""
    os.makedirs(directory, exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            connector_params)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(directory, "mm_projector.npz"), **flat)
    with open(os.path.join(directory, "mm_projector.json"), "w") as f:
        json.dump(sorted(flat), f)


def load_projector_only(directory: str, like: Any) -> Any:
    data = np.load(os.path.join(directory, "mm_projector.npz"))

    def unflatten(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: unflatten(v, f"{prefix}{k}/" if prefix or True
                                 else k) for k, v in tree.items()}
        raise TypeError

    flat_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in flat_like[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        leaves.append(jax.numpy.asarray(data[key], dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def export_hf_projector_bin(path: str, connector_params: Any,
                            cfg) -> None:
    """Export the connector to a torch `mm_projector.bin` with the
    reference's timm/torch key layout, so reference code can load it
    (projector.py:49-63). Inverse of convert_hf.connector_params_from_
    state_dict."""
    import torch
    sd = _projector_state_dict(connector_params, "model.mm_projector.")
    torch.save(sd, path)


def _projector_state_dict(connector_params: Any, prefix: str) -> dict:
    """Connector params -> torch state dict in the reference key layout."""
    import torch
    sd = {}

    def conv_t(kernel, ndim):
        a = np.asarray(kernel)
        if ndim == 2:
            return torch.tensor(a.transpose(3, 2, 0, 1))
        return torch.tensor(a.transpose(4, 3, 0, 1, 2))

    p = connector_params

    def put_cna(name, cna):
        sd[prefix + name + ".conv.weight"] = conv_t(cna["conv"]["kernel"], 2)
        if "bias" in cna["conv"]:
            sd[prefix + name + ".conv.bias"] = torch.tensor(
                np.asarray(cna["conv"]["bias"]))
        if "norm" in cna:
            sd[prefix + name + ".bn.weight"] = torch.tensor(
                np.asarray(cna["norm"]["scale"]))
            sd[prefix + name + ".bn.bias"] = torch.tensor(
                np.asarray(cna["norm"]["bias"]))

    for stage in ("s1", "s2"):
        if stage not in p:
            continue
        for bname, b in p[stage].items():
            base = f"{stage}.{bname}"
            for cname in ("conv1", "conv2", "conv3"):
                put_cna(f"{base}.{cname}", b[cname])
            for f_ in ("fc1", "fc2"):
                sd[prefix + f"{base}.se.{f_}.weight"] = conv_t(
                    b["se"][f_]["kernel"], 2)
                sd[prefix + f"{base}.se.{f_}.bias"] = torch.tensor(
                    np.asarray(b["se"][f_]["bias"]))
            if "downsample" in b:
                put_cna(f"{base}.downsample", b["downsample"])
    if "sampler" in p:
        sd[prefix + "sampler.0.weight"] = conv_t(p["sampler"]["kernel"], 3)
        sd[prefix + "sampler.0.bias"] = torch.tensor(
            np.asarray(p["sampler"]["bias"]))
    if "readout" in p:
        for i, (name, fc) in enumerate(sorted(p["readout"].items())):
            idx = 2 * i
            sd[prefix + f"readout.{idx}.weight"] = torch.tensor(
                np.asarray(fc["kernel"]).T)
            sd[prefix + f"readout.{idx}.bias"] = torch.tensor(
                np.asarray(fc["bias"]))
    # linear / mlpNx projectors: fc1, fc2... at top level
    for name, fc in sorted(p.items()):
        if re.match(r"^fc\d+$", name):
            idx = 2 * (int(name[2:]) - 1)
            sd[prefix + f"{idx}.weight"] = torch.tensor(
                np.asarray(fc["kernel"]).T)
            sd[prefix + f"{idx}.bias"] = torch.tensor(
                np.asarray(fc["bias"]))
    return sd


# peft module names for the stacked-kernel targets (train/lora.py TARGETS)
_PEFT_NAME = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
              "v": "self_attn.v_proj", "o": "self_attn.o_proj",
              "gate": "mlp.gate_proj", "up": "mlp.up_proj",
              "down": "mlp.down_proj"}


def export_lora_split(directory: str, llm_params: Any, connector_params: Any,
                      model_cfg) -> None:
    """LoRA split save (reference videollama2_trainer.py:343-361):

      adapter_model.bin       peft-format LoRA A/B weights
      adapter_config.json     r/alpha/targets
      non_lora_trainables.bin projector weights (base_model.model. prefix)
      config.json             model config for the loader

    Readable back by convert_hf.load_videollama2 path (a) and by the
    reference's own peft loader (model/__init__.py:88-137).
    """
    import torch
    from ..train import lora as lora_lib

    os.makedirs(directory, exist_ok=True)
    adapters = lora_lib.extract_lora(llm_params)["layers"]
    if not adapters:
        raise ValueError("no injected LoRA adapters found in llm params")

    sd = {}
    r = alpha = None
    for name, ab in adapters.items():
        a, b = np.asarray(ab["a"], np.float32), np.asarray(ab["b"],
                                                           np.float32)
        s = float(np.asarray(llm_params["layers"][name]["lora"]["s"]
                             ).reshape(-1)[0])
        r = a.shape[-1]
        alpha = int(round(s * r))
        for layer in range(a.shape[0]):
            base = f"base_model.model.model.layers.{layer}.{_PEFT_NAME[name]}"
            # peft layout: A [r, in], B [out, r] (ours: a [in, r], b [r, out])
            sd[f"{base}.lora_A.weight"] = torch.tensor(a[layer].T)
            sd[f"{base}.lora_B.weight"] = torch.tensor(b[layer].T)
    torch.save(sd, os.path.join(directory, "adapter_model.bin"))

    with open(os.path.join(directory, "adapter_config.json"), "w") as f:
        json.dump({"peft_type": "LORA", "r": r, "lora_alpha": alpha,
                   "lora_dropout": 0.0, "bias": "none",
                   "target_modules": sorted(_PEFT_NAME[n].split(".")[-1]
                                            for n in adapters)}, f, indent=2)

    nl = _projector_state_dict(connector_params,
                               "base_model.model.model.mm_projector.")
    torch.save(nl, os.path.join(directory, "non_lora_trainables.bin"))

    from .convert_hf import model_config_to_hf
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(model_config_to_hf(model_cfg), f, indent=2)
