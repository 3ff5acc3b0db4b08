"""Sharded, jitted training step (the DeepSpeed-ZeRO replacement).

One `jax.jit` over the mesh with params/optimizer state sharded per
parallel/sharding.py: GSPMD emits the all-gather (ZeRO-3 param gather),
reduce-scatter (gradient sharding), and TP collectives the reference got from
DeepSpeed + NCCL (scripts/zero3.json; SURVEY.md §2.3). Gradient accumulation
is a `lax.scan` over microbatches inside the step (the bash-side GAS
computation of pretrain.sh:24-27 becomes a function argument).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import ModelConfig
from ..models import videollama2 as vl2
from ..parallel import sharding as sh
from .data import Batch


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _loss_fn(params, cfg: ModelConfig, batch: Batch, compute_dtype,
             attn_impl: str, constrain_fn=None, remat=True):
    frames = batch.frames
    if jnp.issubdtype(frames.dtype, jnp.floating):
        frames = frames.astype(compute_dtype)
    # uint8 frames pass through: encode_frames normalizes on device
    loss, metrics = vl2.forward_train(
        params, cfg, frames, batch.text_ids, batch.is_visual,
        batch.vis_index, batch.positions, batch.valid_len, batch.labels,
        attn_impl=attn_impl, remat=remat, constrain_fn=constrain_fn)
    return loss, metrics


def make_train_step(cfg: ModelConfig, tx, mesh: Optional[Mesh] = None,
                    compute_dtype=jnp.bfloat16, attn_impl: str = "auto",
                    grad_accum: int = 1, trainable: Any = None,
                    sequence_parallel: bool = False, remat=True):
    """Build the jitted train step.

    Batch arrays arrive as [grad_accum * microbatch, ...]; when grad_accum>1
    the step scans over microbatches accumulating fp32 grads.

    `trainable` (optional bool pytree over params) restricts differentiation
    to the flagged leaves: jax.grad never sees the frozen ones, which (a)
    lets XLA dead-code-eliminate their backward pass and (b) is REQUIRED for
    QLoRA, whose int8 base weights cannot be cotangents
    (optimizer.trainable_mask; reference train.py:404-481).

    `sequence_parallel` turns on Ulysses SP annotations in the LLM forward
    (parallel/sharding.sequence_parallel): requires a mesh with seq > 1.
    """

    constrain_fn = sh.constrain_batch if mesh is not None else None
    sp_on = sequence_parallel and mesh is not None

    def _grads(params, b):
        if trainable is None:
            return jax.value_and_grad(_loss_fn, has_aux=True)(
                params, cfg, b, compute_dtype, attn_impl, constrain_fn,
                remat)
        leaves, treedef = jax.tree.flatten(params)
        flags = jax.tree.leaves(trainable)
        t_leaves = [l for l, f in zip(leaves, flags) if f]

        def loss_of(t_leaves):
            it = iter(t_leaves)
            full = [next(it) if f else l for l, f in zip(leaves, flags)]
            return _loss_fn(jax.tree.unflatten(treedef, full), cfg, b,
                            compute_dtype, attn_impl, constrain_fn, remat)

        (loss, metrics), t_grads = jax.value_and_grad(
            loss_of, has_aux=True)(t_leaves)
        it = iter(t_grads)
        # frozen leaves get SCALAR zero "grads" in the param dtype: optax
        # set_to_zero ignores them, apply_updates stays dtype-stable (no
        # f32 promotion of int8 bases), and no full-shape buffer exists
        grads = [next(it) if f else jnp.zeros((), l.dtype)
                 for l, f in zip(leaves, flags)]
        return (loss, metrics), jax.tree.unflatten(treedef, grads)

    def step_fn(state: TrainState, batch: Batch):
        def compute(b):
            # context manager is trace-time: it is active here because
            # step_fn runs inside jit's trace
            if sp_on:
                with sh.sequence_parallel():
                    (loss, metrics), grads = _grads(state.params, b)
                return loss, metrics, grads
            (loss, metrics), grads = _grads(state.params, b)
            return loss, metrics, grads

        if grad_accum == 1:
            b = jax.tree.map(sh.constrain_batch, batch) if mesh else batch
            loss, metrics, grads = compute(b)
        else:
            def micro(carry, mb):
                acc_grads, acc_metrics = carry
                if mesh:
                    mb = jax.tree.map(sh.constrain_batch, mb)
                loss, metrics, grads = compute(mb)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_metrics), None

            reshaped = jax.tree.map(
                lambda a: a.reshape((grad_accum, -1) + a.shape[1:]), batch)
            if trainable is None:
                zero_grads = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            else:
                zero_grads = jax.tree.map(
                    lambda p, f: (jnp.zeros(p.shape, jnp.float32) if f
                                  else jnp.zeros((), p.dtype)),
                    state.params, trainable)
            zero_metrics = {"loss": jnp.zeros(()),
                            "num_tokens": jnp.zeros((), jnp.int32),
                            "accuracy": jnp.zeros(())}
            (grads, msum), _ = jax.lax.scan(micro,
                                            (zero_grads, zero_metrics),
                                            reshaped)
            grads = jax.tree.map(
                lambda g: g / grad_accum if g.ndim > 0 else g, grads)
            metrics = jax.tree.map(lambda m: m / grad_accum, msum)
            metrics["num_tokens"] = msum["num_tokens"]

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    # shardings: params per rule table; opt state mirrors params; batch over dp
    def sharded_step(state, batch):
        return step_fn(state, batch)

    return jax.jit(sharded_step, donate_argnums=(0,))


def init_sharded_state(mesh: Mesh, params_host, tx,
                       is_moe: bool = False) -> TrainState:
    """Place params on the mesh and init the optimizer state there.

    Moment tensors are same-shaped as params, so initializing under jit lets
    XLA propagate the param shardings into the optimizer state — the
    ZeRO-style sharded-optimizer layout with zero bookkeeping.

    Scalar leaves (optax `count`, the step counter) come out of jit as
    single-device arrays; pin them replicated on the mesh. Left
    single-device they work only by accident (uncommitted outputs auto-
    move) — a checkpoint RESTORE commits them to device 0 and the next
    jitted step rejects the mixed device set.
    """
    params = sh.shard_params(mesh, params_host, is_moe)
    opt_state = jax.jit(tx.init)(params)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def _replicate_scalars(a):
        if isinstance(a.sharding, jax.sharding.SingleDeviceSharding):
            return jax.device_put(a, rep)
        return a
    opt_state = jax.tree.map(_replicate_scalars, opt_state)
    return TrainState(params=params, opt_state=opt_state,
                      step=jax.device_put(jnp.zeros((), jnp.int32), rep))
