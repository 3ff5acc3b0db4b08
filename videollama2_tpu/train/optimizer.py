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


def param_labels(params):
    """Label tree: 'frozen' (vision tower), 'projector' (connector),
    'llm' (decoder)."""
    def label(top_key):
        if top_key == "vision":
            return "frozen"
        if top_key == "connector":
            return "projector"
        return "llm"
    return {k: jax.tree.map(lambda _: label(k), v)
            for k, v in params.items()}


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
        param_labels(params))
    return tx
