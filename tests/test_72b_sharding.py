"""Qwen2-72B tensor-parallel sharding at real shape (no weights).

SURVEY §7 names "72B multi-host" a hard part; VERDICT r1 #9 asks for an
eval_shape-level proof that the rule table (parallel/sharding.py) partitions
every 72B parameter over an 8-way `tensor` axis without silent replication
of the big matmuls and with every sharded dim divisible by the axis size.
The multi-host launch plan lives in docs/MULTIHOST.md.
"""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.models import llm as llm_lib
from videollama2_tpu.parallel import sharding as sh

TENSOR = 8          # v5e-8 slice: 8-way TP
FSDP = 16           # cross-host ZeRO axis (2 hosts x v5e-8 pods over DCN)
BIG = 1_000_000     # replicating anything bigger than this is a bug


def _axis_size(name):
    return {"tensor": TENSOR, "fsdp": FSDP, "data": 1, "expert": 1}[name]


def test_qwen2_72b_every_param_sharded_at_shape():
    cfg = cfglib.qwen2_72b()
    shapes = jax.eval_shape(
        lambda: llm_lib.init_params(jax.random.PRNGKey(0), cfg,
                                    jnp.bfloat16))
    specs = sh.param_specs({"llm": shapes}, is_moe=False)

    flat_shapes = jax.tree_util.tree_flatten_with_path({"llm": shapes})[0]
    flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index"))
    assert len(flat_shapes) == len(flat_specs)

    replicated_big = []
    for (path, leaf), spec in zip(flat_shapes, flat_specs):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        named = [ax for ax in spec if ax is not None]
        size = int(np.prod(leaf.shape))
        if size >= BIG and not named:
            replicated_big.append((key, leaf.shape))
        # every sharded dim must divide by its axis size (XLA would pad or
        # fail otherwise)
        for dim, ax in zip(leaf.shape[-len(spec):] if spec else (), spec):
            if ax is None:
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            total = 1
            for a in axes:
                total *= _axis_size(a)
            assert dim % total == 0, (key, leaf.shape, spec)
    assert not replicated_big, replicated_big


def test_qwen2_72b_tp8_per_device_bytes_fit():
    """With tensor=8 x fsdp=16, per-device bf16 param bytes must fit a v5e
    chip (16 GB HBM) with ample headroom for cache/activations."""
    cfg = cfglib.qwen2_72b()
    shapes = jax.eval_shape(
        lambda: llm_lib.init_params(jax.random.PRNGKey(0), cfg,
                                    jnp.bfloat16))
    specs = sh.param_specs({"llm": shapes}, is_moe=False)
    flat_shapes = jax.tree_util.tree_flatten_with_path({"llm": shapes})[0]
    flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index"))
    per_device = 0
    for (path, leaf), spec in zip(flat_shapes, flat_specs):
        shard = 1
        for ax in spec:
            if ax is None:
                continue
            for a in (ax if isinstance(ax, tuple) else (ax,)):
                shard *= _axis_size(a)
        per_device += int(np.prod(leaf.shape)) * 2 // shard
    # 72B bf16 = 144 GB total / 128 devices ~= 1.2 GB/device
    assert per_device < 4e9, per_device
