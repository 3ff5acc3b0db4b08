"""Pallas flash-attention parity vs the XLA reference (interpreter mode on
the CPU test mesh; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.ops.attention import attend_xla
from videollama2_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, B, S, Hq, Hkv, D):
    q = rng.standard_normal((B, S, Hq, D), dtype=np.float32)
    k = rng.standard_normal((B, S, Hkv, D), dtype=np.float32)
    v = rng.standard_normal((B, S, Hkv, D), dtype=np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_flash_matches_xla(causal, hq, hkv):
    rng = np.random.default_rng(0)
    B, S, D = 2, 256, 64
    q, k, v = _rand_qkv(rng, B, S, hq, hkv, D)
    valid = jnp.array([S, S - 57])
    ref = attend_xla(q, k, v, valid_len=valid, causal=causal)
    got = flash_attention(q, k, v, valid_len=valid, causal=causal,
                          block_q=128, block_k=128, interpret=True)
    # rows beyond valid_len are garbage in both paths; compare valid rows
    for b, vl in enumerate([S, S - 57]):
        np.testing.assert_allclose(np.asarray(got[b, :vl]),
                                   np.asarray(ref[b, :vl]),
                                   rtol=2e-5, atol=2e-5)


def test_flash_via_attend_padding():
    """attend() pads non-128-multiple seqs (ViT's 577) for the kernel."""
    from videollama2_tpu.ops import attention as A
    rng = np.random.default_rng(1)
    B, S, H, D = 2, 193, 4, 64
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    ref = A.attend_xla(q, k, v, causal=False)
    # force pallas path (interpret auto-enables off-TPU)
    got = A.attend(q, k, v, causal=False, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_vjp_backward_runs():
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 128, 2, 64
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    from videollama2_tpu.ops.flash_attention import flash_attention_vjp

    def loss(q, k, v):
        return jnp.sum(flash_attention_vjp(q, k, v, None, True, D ** -0.5))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return jnp.sum(attend_xla(q, k, v, causal=True))

    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hp,pack", [(1, False), (2, False), (4, False),
                                     (4, True), (4, None)])
def test_encoder_attention_matches_xla(hp, pack):
    """encoder_attention (multi-head cells AND packed head pairs) vs XLA."""
    from videollama2_tpu.ops.encoder_attention import encoder_attention
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 256, 4, 64
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    valid = jnp.array([S, S - 57])
    ref = attend_xla(q, k, v, valid_len=valid, causal=False)
    got = encoder_attention(q, k, v, valid_len=valid, heads_per_cell=hp,
                            interpret=True, pack_pairs=pack)
    for b, vl in enumerate([S, S - 57]):
        np.testing.assert_allclose(np.asarray(got[b, :vl]),
                                   np.asarray(ref[b, :vl]),
                                   rtol=2e-5, atol=2e-5)


def test_encoder_attention_packed_auto_off_for_odd_head_dim():
    """SigLIP-shaped hd=72 must auto-select the un-packed kernel."""
    from videollama2_tpu.ops.encoder_attention import encoder_attention
    rng = np.random.default_rng(5)
    B, S, H, D = 1, 128, 4, 72
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    ref = attend_xla(q, k, v, causal=False)
    got = encoder_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encoder_attention_no_valid_len():
    from videollama2_tpu.ops.encoder_attention import encoder_attention
    rng = np.random.default_rng(4)
    B, S, H, D = 1, 128, 8, 64  # hp > H exercises the hp-reduction loop
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    ref = attend_xla(q, k, v, causal=False)
    got = encoder_attention(q, k, v, heads_per_cell=16, interpret=True,
                            pack_pairs=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encoder_attention_packed_matches_unpacked():
    """CLIP-L-shaped: packed pairs vs multi-head cells, same kernel family."""
    from videollama2_tpu.ops.encoder_attention import encoder_attention
    rng = np.random.default_rng(6)
    B, S, H, D = 2, 128, 16, 64
    q, k, v = _rand_qkv(rng, B, S, H, H, D)
    valid = jnp.array([S, S - 31])
    a = encoder_attention(q, k, v, valid_len=valid, interpret=True,
                          pack_pairs=True)
    b = encoder_attention(q, k, v, valid_len=valid, interpret=True,
                          pack_pairs=False)
    for i, vl in enumerate([S, S - 31]):
        np.testing.assert_allclose(np.asarray(a[i, :vl]),
                                   np.asarray(b[i, :vl]),
                                   rtol=2e-5, atol=2e-5)
