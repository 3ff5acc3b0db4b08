"""LoRA: low-rank adapters on the LLM's linear projections.

Parity: reference LoRA config r=128, alpha=256, dropout 0.05, targets = all
linear layers except projector/tower/lm_head (videollama2_trainer.py:75-88;
train.py:465-481; scripts/custom/finetune_lora.sh:42-43). QLoRA pairs this
with 4-bit base weights (ops/quant.py).

Functional formulation: adapters live in a separate pytree
  lora = {"layers": {"q": {"a": [L, D, r], "b": [L, r, out]}, ...}}
merged on the fly: W_eff = W + (alpha/r) * A @ B. `merge_lora` folds adapters
into base params for export (model/__init__.py:88-137 merge path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# LLM projections adaptable by LoRA (stacked [L, in, out] kernels)
TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    dropout: float = 0.05
    targets: Tuple[str, ...] = TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def init_lora(rng: jax.Array, llm_params: Dict, cfg: LoraConfig,
              dtype=jnp.float32) -> Dict:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 so the initial delta is zero."""
    out: Dict = {"layers": {}}
    layers = llm_params["layers"]
    for i, name in enumerate(cfg.targets):
        if name not in layers or "kernel" not in layers[name]:
            continue
        k = layers[name]["kernel"]
        L, d_in, d_out = k.shape
        rng, sub = jax.random.split(rng)
        a = (jax.random.normal(sub, (L, d_in, cfg.r), jnp.float32)
             / jnp.sqrt(cfg.r)).astype(dtype)
        b = jnp.zeros((L, cfg.r, d_out), dtype)
        out["layers"][name] = {"a": a, "b": b}
    return out


def inject_lora(rng: jax.Array, llm_params: Dict, cfg: LoraConfig,
                dtype=jnp.float32) -> Dict:
    """Attach trainable adapters INSIDE the layer param dicts.

    Each target entry gains "lora": {"a": [L, in, r], "b": [L, r, out],
    "s": [L, 1, 1]} which ops/layers.dense consumes as y += x@A@B*s — the
    peft wrap of reference train.py:465-481 without materializing full-rank
    deltas. Works over bf16 kernels AND int8 packs (QLoRA: frozen quantized
    base, reference train.py:404-423). A ~ N(0, 1/r), B = 0 (delta starts
    at zero); s = alpha/r replicated over L so the tree scans uniformly.
    """
    new_layers = dict(llm_params["layers"])
    for name in cfg.targets:
        entry = new_layers.get(name)
        if entry is None:
            continue
        if "kernel" in entry:
            L, d_in, d_out = entry["kernel"].shape
        elif "kernel_q8" in entry:
            L, d_in, d_out = entry["kernel_q8"]["q"].shape
        elif "kernel_q4" in entry:
            L, d_in, d_out = entry["kernel_q4"]["q4"].shape
            d_in *= 2                    # int4 packs two rows per byte
        else:
            continue
        rng, sub = jax.random.split(rng)
        a = (jax.random.normal(sub, (L, d_in, cfg.r), jnp.float32)
             / jnp.sqrt(cfg.r)).astype(dtype)
        new_layers[name] = {**entry, "lora": {
            "a": a,
            "b": jnp.zeros((L, cfg.r, d_out), dtype),
            "s": jnp.full((L, 1, 1), cfg.scaling, dtype),
        }}
    return {**llm_params, "layers": new_layers}


def extract_lora(llm_params: Dict) -> Dict:
    """Pull injected adapters back out into the separate-tree form."""
    out: Dict = {"layers": {}}
    for name, entry in llm_params["layers"].items():
        if isinstance(entry, dict) and "lora" in entry:
            out["layers"][name] = {k: entry["lora"][k] for k in ("a", "b")}
    return out


def strip_lora(llm_params: Dict) -> Dict:
    """Remove injected adapters (leaving the frozen base)."""
    new_layers = {}
    for name, entry in llm_params["layers"].items():
        if isinstance(entry, dict) and "lora" in entry:
            entry = {k: v for k, v in entry.items() if k != "lora"}
        new_layers[name] = entry
    return {**llm_params, "layers": new_layers}


def merge_lora_injected(llm_params: Dict) -> Dict:
    """Fold injected adapters into the bf16 base kernels (export/serving).

    Quantized bases keep their adapters unmerged (dense applies them at
    runtime) — merging into int8 would lose the delta to quantization.
    """
    new_layers = {}
    for name, entry in llm_params["layers"].items():
        if isinstance(entry, dict) and "lora" in entry and "kernel" in entry:
            lo = entry["lora"]
            delta = jnp.einsum("lir,lro->lio", lo["a"].astype(jnp.float32),
                               lo["b"].astype(jnp.float32)) * lo["s"]
            entry = {k: v for k, v in entry.items() if k != "lora"}
            entry["kernel"] = (entry["kernel"]
                               + delta.astype(entry["kernel"].dtype))
        new_layers[name] = entry
    return {**llm_params, "layers": new_layers}


def apply_lora(llm_params: Dict, lora: Dict, cfg: LoraConfig) -> Dict:
    """Return params with adapters folded in (for forward passes).

    The delta matmul is rank-r so folding per step is cheap relative to the
    base matmuls; XLA fuses the add into the consumer.
    """
    new_layers = dict(llm_params["layers"])
    for name, ab in lora["layers"].items():
        base = new_layers[name]
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * cfg.scaling
        new_layers[name] = {**base,
                            "kernel": base["kernel"] + delta.astype(
                                base["kernel"].dtype)}
    return {**llm_params, "layers": new_layers}


def merge_lora(params: Dict, lora: Dict, cfg: LoraConfig) -> Dict:
    """Permanently fold adapters into a full param tree (export path)."""
    return {**params, "llm": apply_lora(params["llm"], lora, cfg)}


def lora_params_from_peft_state_dict(sd, llm_cfg, cfg: LoraConfig) -> Dict:
    """Import a reference peft `adapter_model.bin`
    (keys: base_model.model.model.layers.{l}.self_attn.q_proj.lora_A.weight).
    """
    import numpy as np
    name_map = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
                "v": "self_attn.v_proj", "o": "self_attn.o_proj",
                "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                "down": "mlp.down_proj"}
    out: Dict = {"layers": {}}
    L = llm_cfg.num_layers
    for ours, theirs in name_map.items():
        a_list, b_list = [], []
        for l in range(L):
            ka = (f"base_model.model.model.layers.{l}.{theirs}."
                  f"lora_A.weight")
            kb = (f"base_model.model.model.layers.{l}.{theirs}."
                  f"lora_B.weight")
            if ka not in sd:
                break
            # peft stores A [r, in], B [out, r]; ours: a [in, r], b [r, out]
            a_list.append(np.asarray(sd[ka], dtype=np.float32).T)
            b_list.append(np.asarray(sd[kb], dtype=np.float32).T)
        if len(a_list) == L:
            out["layers"][ours] = {"a": np.stack(a_list),
                                   "b": np.stack(b_list)}
    return out
