"""Device mesh construction.

Replaces the reference's torchrun/NCCL/DeepSpeed process topology
(scripts/vllava/pretrain.sh:36-44, scripts/zero{2,3}.json) with a named
`jax.sharding.Mesh`. Axes:

  data   — pure data parallelism (batch sharding)
  fsdp   — ZeRO-3-equivalent parameter/optimizer sharding (+ batch sharding)
  tensor — Megatron-style tensor parallelism (heads / FFN channels)
  expert — Mixtral expert parallelism (E dimension)
  seq    — Ulysses-style sequence parallelism (long-context prefill /
           training: tokens shard over `seq` everywhere except attention,
           which all-to-alls to head sharding — parallel/sharding.py
           sequence_parallel). Absent in the reference (SURVEY §2.3).

Collectives ride ICI within a slice; cross-slice (DCN) deployments put `data`
outermost so gradient all-reduces are the only DCN traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_NAMES = ("data", "fsdp", "tensor", "expert", "seq")


def make_mesh(data: int = 1, fsdp: int = -1, tensor: int = 1,
              expert: int = 1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over available devices. fsdp=-1 absorbs the remainder."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    fixed = data * tensor * expert * seq
    if fsdp == -1:
        assert n % fixed == 0, (n, fixed)
        fsdp = n // fixed
    assert data * fsdp * tensor * expert * seq == n, \
        f"mesh {data}x{fsdp}x{tensor}x{expert}x{seq} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp, tensor, expert, seq)
    return Mesh(arr, AXIS_NAMES)


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, fsdp=1, tensor=1, expert=1,
                     devices=jax.devices()[:1])
