"""Optimizer construction: AdamW + warmup-cosine, two-LR groups, freezing.

Parity: the reference trainer builds separate param groups so the projector
can train at `mm_projector_lr` while the LLM uses the base LR, with weight
decay excluded for norms/biases (videollama2_trainer.py:240-318); the vision
tower is always frozen (train.py:534) and pretrain mode trains the projector
only (train.py:513-516). Implemented with optax.multi_transform over a
param-label tree — frozen groups get `set_to_zero`, which also lets the jitted
step skip their gradient computation via `stop_gradient` upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclass
class OptimizerConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 10000
    schedule: str = "cosine"          # "cosine" | "constant" | "linear"
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    tune_mm_mlp_adapter: bool = False  # pretrain: projector-only
    freeze_backbone: bool = False
    lora_enable: bool = False          # train adapters only (+ projector)


def _schedule(base_lr: float, cfg: OptimizerConfig):
    warmup = max(int(cfg.warmup_ratio * cfg.total_steps), 0)
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, max(cfg.total_steps, warmup + 1), 0.0)
    if cfg.schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup),
             optax.linear_schedule(base_lr, 0.0, cfg.total_steps - warmup)],
            [warmup])
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup),
         optax.constant_schedule(base_lr)], [warmup])


def _decay_mask(params):
    """No weight decay for 1-D params (norm scales, biases); parity with the
    reference trainer's ALL_LAYERNORM_LAYERS + bias exclusion."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def param_labels(params, lora_enable: bool = False):
    """Label tree: 'frozen' (vision tower + non-adapter LLM under LoRA),
    'projector' (connector), 'llm' (decoder / adapters).

    Under LoRA only the injected adapter a/b matrices train at the base LR
    (the frozen-base peft semantics of reference train.py:465-481); the
    alpha/r scale "s" and every integer quant leaf stay frozen.
    """
    def label(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[0] == "vision":
            return "frozen"
        if keys[0] == "connector":
            return "projector"
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            return "frozen"              # int8/int4 quantized base weights
        if lora_enable:
            return ("llm" if "lora" in keys and keys[-1] in ("a", "b")
                    else "frozen")
        if "lora" in keys and keys[-1] == "s":
            return "frozen"              # alpha/r constant
        return "llm"
    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(params, cfg: OptimizerConfig):
    """Bool pytree: True where gradients are needed. Mirrors the label tree
    so the train step can skip (and jax.grad never touches) frozen leaves —
    required for integer quantized bases, which cannot be differentiated."""
    labels = param_labels(params, cfg.lora_enable)
    frozen_llm = cfg.tune_mm_mlp_adapter or cfg.freeze_backbone
    return jax.tree.map(
        lambda lb: lb == "projector" or (lb == "llm" and not frozen_llm),
        labels)


def build_optimizer(params, cfg: OptimizerConfig):
    proj_lr = cfg.mm_projector_lr or cfg.learning_rate

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(_schedule(lr, cfg), b1=cfg.b1, b2=cfg.b2,
                        eps=cfg.eps, weight_decay=cfg.weight_decay,
                        mask=_decay_mask),
        )

    llm_tx = (optax.set_to_zero()
              if (cfg.tune_mm_mlp_adapter or cfg.freeze_backbone)
              else adamw(cfg.learning_rate))
    tx = optax.multi_transform(
        {"frozen": optax.set_to_zero(),
         "projector": adamw(proj_lr),
         "llm": llm_tx},
        param_labels(params, cfg.lora_enable))
    return tx
