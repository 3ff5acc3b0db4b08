"""Tiled Pallas flash-attention backward vs the XLA reference vjp.

Until round 5 flash_attention_vjp's backward fell back to jax.vjp over the
XLA attention, materializing the full [B, H, Sq, Sk] probability tensor per
layer per training step (the named suspect in the S=2048 SFT utilization
gap, VERDICT r4 weak #3). The tiled backward (ops/flash_attention.
flash_attention_bwd) recomputes [bq, bk] probability tiles from the saved
logsumexp. These tests pin dq/dk/dv against the XLA vjp across causal,
padded (valid_len), GQA and non-causal configurations, in interpret mode
(the same program Mosaic compiles on TPU).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.ops import attention as attn
from videollama2_tpu.ops.flash_attention import (flash_attention,
                                                 flash_attention_vjp)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def _grads_ref(q, k, v, valid_len, causal, scale, g):
    def ref(q, k, v):
        return attn.attend_xla(q, k, v, valid_len=valid_len, causal=causal,
                               scale=scale)
    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


@pytest.mark.parametrize("causal,hq,hkv,valid", [
    (True, 4, 4, None),
    (True, 4, 2, None),          # GQA
    (True, 4, 2, (96, 40)),      # GQA + right padding
    (False, 4, 4, (96, 40)),     # encoder-style
])
def test_flash_backward_matches_xla(causal, hq, hkv, valid):
    B, Sq, Sk, D = 2, 128, 128, 32
    q = _rand((B, Sq, hq, D), 0) * 0.3
    k = _rand((B, Sk, hkv, D), 1) * 0.3
    v = _rand((B, Sk, hkv, D), 2) * 0.3
    g = _rand((B, Sq, hq, D), 3) * 0.3
    vl = jnp.asarray(valid, jnp.int32) if valid is not None else None
    scale = D ** -0.5

    dq_r, dk_r, dv_r = _grads_ref(q, k, v, vl, causal, scale, g)

    def fa(q, k, v):
        return flash_attention_vjp(q, k, v, vl, causal, scale)
    out, vjp = jax.vjp(fa, q, k, v)
    dq, dk, dv = vjp(g)

    # forward parity first (sanity on the lse-emitting path)
    ref_out = attn.attend_xla(q, k, v, valid_len=vl, causal=causal,
                              scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=2e-4, atol=2e-4)


def test_flash_backward_blocks_smaller_than_seq():
    """Multi-block paths on both grids (bq=bk=32 over S=128) must equal the
    single-block result — exercises the causal block pruning bounds."""
    from videollama2_tpu.ops.flash_attention import flash_attention_bwd
    B, S, H, D = 1, 128, 2, 32
    q = _rand((B, S, H, D), 4) * 0.3
    k = _rand((B, S, H, D), 5) * 0.3
    v = _rand((B, S, H, D), 6) * 0.3
    g = _rand((B, S, H, D), 7) * 0.3
    vl = jnp.asarray([100], jnp.int32)
    scale = D ** -0.5
    out, lse = flash_attention(q, k, v, vl, True, scale, return_lse=True)

    small = flash_attention_bwd(q, k, v, out, lse, g, vl, True, scale,
                                block_q=32, block_k=32)
    big = flash_attention_bwd(q, k, v, out, lse, g, vl, True, scale,
                              block_q=128, block_k=128)
    for a, b in zip(small, big):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_lse_matches_dense():
    """return_lse must equal log-sum-exp of the masked scaled scores."""
    B, S, H, D = 2, 64, 2, 32
    q = _rand((B, S, H, D), 8) * 0.5
    k = _rand((B, S, H, D), 9) * 0.5
    v = _rand((B, S, H, D), 10) * 0.5
    vl = jnp.asarray([64, 30], jnp.int32)
    scale = D ** -0.5
    _, lse = flash_attention(q, k, v, vl, True, scale, return_lse=True)

    # lse is lane-broadcast [B, H, S, 128] (Mosaic block layout); every lane
    # must carry the same value
    lse = np.asarray(lse)
    np.testing.assert_array_equal(
        lse, np.broadcast_to(lse[..., :1], lse.shape))

    s = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) * scale
    qi = np.arange(S)[:, None]
    ki = np.arange(S)[None, :]
    for b in range(B):
        mask = (qi >= ki) & (ki < int(vl[b]))
        sb = np.where(mask[None], s[b], -np.inf)
        want = np.log(np.exp(sb).sum(-1))               # [H, S]
        got = lse[b, :, :, 0]
        rows = qi[:, 0] < S  # all rows valid here (query rows unmasked)
        np.testing.assert_allclose(got[:, rows], want[:, rows],
                                   rtol=1e-5, atol=1e-5)


def test_training_grad_through_attend():
    """End-to-end: grads of a scalar loss through attend(impl='pallas')
    equal the XLA-impl grads (the path the LLM training forward takes on
    TPU)."""
    B, S, H, D = 2, 128, 4, 32
    q = _rand((B, S, H, D), 11) * 0.3
    k = _rand((B, S, H // 2, D), 12) * 0.3
    v = _rand((B, S, H // 2, D), 13) * 0.3
    vl = jnp.asarray([128, 77], jnp.int32)

    def loss(q, k, v, impl):
        o = attn.attend(q, k, v, valid_len=vl, causal=True, impl=impl)
        return jnp.sum(jnp.tanh(o))

    gx = jax.grad(functools.partial(loss, impl="xla"), argnums=(0, 1, 2))(
        q, k, v)
    gp = jax.grad(functools.partial(loss, impl="pallas"), argnums=(0, 1, 2))(
        q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
