"""Parameter and activation sharding rules (GSPMD partition specs).

The reference has no TP/SP and relies on DeepSpeed ZeRO for memory scaling
(SURVEY.md §2.3). Here sharding is first-class: one rule table maps param-tree
paths to PartitionSpecs; XLA GSPMD inserts the all-gathers/reduce-scatters
(the ZeRO equivalent) and the TP collectives from these annotations.

Conventions (stacked-layer trees, kernels [in, out]):
  * attention qkv kernels  [L, D, H*hd] -> (None, fsdp, tensor)   (column TP)
  * attention out kernel   [L, H*hd, D] -> (None, tensor, fsdp)   (row TP)
  * mlp gate/up            [L, D, F]    -> (None, fsdp, tensor)
  * mlp down               [L, F, D]    -> (None, tensor, fsdp)
  * MoE expert weights     [L, E, D, F] -> (None, expert, fsdp, tensor)
  * embeddings             [V, D]       -> (tensor, fsdp)
  * norms / biases / small convs        -> replicated
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec). Paths are "/"-joined tree keys, e.g.
# "llm/layers/q/kernel". First match wins.
PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # LLM
    (r"llm/embed/weight$", P(None, ("fsdp", "tensor"))),
    (r"llm/lm_head/kernel$", P("fsdp", "tensor")),
    (r"llm/layers/(q|k|v)/kernel$", P(None, "fsdp", "tensor")),
    (r"llm/layers/(q|k|v)/bias$", P(None, "tensor")),
    (r"llm/layers/o/kernel$", P(None, "tensor", "fsdp")),
    (r"llm/layers/router/kernel$", P(None, "fsdp", None)),
    (r"llm/layers/(gate|up)/kernel$", P(None, "expert", "fsdp", "tensor")),
    (r"llm/layers/down/kernel$", P(None, "expert", "tensor", "fsdp")),
    (r"llm/layers/.*norm/scale$", P(None, None)),
    (r"llm/final_norm/scale$", P(None)),
    # Vision tower (frozen; shard the big matmuls)
    (r"vision/layers/(q|k|v|fc1)/kernel$", P(None, "fsdp", "tensor")),
    (r"vision/layers/(o|fc2)/kernel$", P(None, "tensor", "fsdp")),
    (r"vision/layers/fc1/bias$", P(None, "tensor")),
    (r"vision/pos_embed/weight$", P(None, None)),
    # Connector: 1x1 conv kernels are [1,1,Cin,Cout] matmuls
    (r"connector/s\d/b\d/conv[13]/conv/kernel$", P(None, None, "fsdp",
                                                   "tensor")),
    (r"connector/sampler/kernel$", P(None, None, None, "fsdp", "tensor")),
    (r"connector/readout/fc\d/kernel$", P("fsdp", "tensor")),
)

# dense-layer [L, D, F] rules when the model is dense (no expert dim)
DENSE_FFN_RULES: Tuple[Tuple[str, P], ...] = (
    (r"llm/layers/(gate|up)/kernel$", P(None, "fsdp", "tensor")),
    (r"llm/layers/down/kernel$", P(None, "tensor", "fsdp")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path: str, ndim: int, is_moe: bool) -> P:
    rules = PARAM_RULES if is_moe else (DENSE_FFN_RULES + PARAM_RULES)
    for pattern, spec in rules:
        if re.search(pattern, path):
            if len(spec) > ndim:
                # rule written for the wider (MoE) layout; drop axes
                spec = P(*spec[len(spec) - ndim:])
            return spec
    return P()  # replicate


def param_specs(params: Any, is_moe: bool = False):
    """Pytree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), leaf.ndim, is_moe),
        params)


def param_shardings(mesh: Mesh, params: Any, is_moe: bool = False):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        param_specs(params, is_moe))


def shard_params(mesh: Mesh, params: Any, is_moe: bool = False):
    """Place a host param tree onto the mesh per the rule table.

    device_put may ALIAS the device-0 replica with a source jax.Array, so a
    later donated train step would delete the caller's tree; jax.Array
    sources are privately copied first (numpy inputs never alias).
    """
    shardings = param_shardings(mesh, params, is_moe)

    def _put(x, s):
        import jax.numpy as jnp
        if isinstance(x, jax.Array):
            x = jnp.array(x, copy=True)
        return jax.device_put(x, s)

    return jax.tree.map(_put, params, shardings)


# Activation specs
BATCH_SPEC = P(("data", "fsdp"))              # batch dim sharded over dp+fsdp
SEQ_ACT_SPEC = P(("data", "fsdp"), None, None)  # [B, S, D]


def constrain_batch(x: jax.Array) -> jax.Array:
    """Annotate [B, ...] activations as batch-sharded (inside jit)."""
    spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


# ---------------------------------------------------------------------------
# Ulysses-style sequence parallelism (trace-time context)
#
# Tokens shard over the `seq` mesh axis everywhere EXCEPT attention, which
# needs every key for every query: q/k/v are re-annotated head-sharded over
# the same axis, so GSPMD inserts the two all-to-alls (seq-shard -> head-
# shard -> seq-shard) that define DeepSpeed-Ulysses. Composes with tensor
# parallelism: the head dim is sharded over ("tensor", "seq") jointly, so
# heads must be divisible by tp*sp. Absent in the reference (SURVEY §2.3);
# enables context lengths whose activations exceed one chip.
# ---------------------------------------------------------------------------

_SP_ON = False


@contextmanager
def sequence_parallel(enabled: bool = True):
    """Enable SP annotations in models/llm.forward while tracing. Must wrap
    the traced body (inside jit), like ops/layers.w8a8_prefill."""
    global _SP_ON
    prev = _SP_ON
    _SP_ON = enabled
    try:
        yield
    finally:
        _SP_ON = prev


def sp_enabled() -> bool:
    return _SP_ON


def sp_shard_seq(x: jax.Array) -> jax.Array:
    """[B, S, ...]: tokens sharded over `seq` (MLP/norm/residual regions)."""
    if not _SP_ON:
        return x
    spec = P(("data", "fsdp"), "seq", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def sp_shard_heads(x: jax.Array) -> jax.Array:
    """[B, S, H, hd]: full sequence per shard, heads sharded — the
    all-to-all side of Ulysses attention."""
    if not _SP_ON:
        return x
    spec = P(("data", "fsdp"), None, ("tensor", "seq"), None)
    return jax.lax.with_sharding_constraint(x, spec)
