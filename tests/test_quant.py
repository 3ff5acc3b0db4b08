"""Weight-only quantization tests (bitsandbytes replacement)."""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.models import llm as jllm
from videollama2_tpu.ops import quant


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 64, 32)).astype(np.float32))
    pack = quant.quantize_int8(w, axis=-2)
    deq = quant.dequantize_int8(pack, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    scale = np.asarray(pack["scale"]).max()
    assert err <= scale * 0.51  # half-ULP of the int8 grid


def test_int4_roundtrip_error():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    pack = quant.quantize_int4(w, axis=-2)
    assert pack["q4"].shape == (32, 32)  # packed along axis -2
    deq = quant.dequantize_int4(pack, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    scale = np.asarray(pack["scale"]).max()
    assert err <= scale * 0.51


def test_quantized_llm_forward_close():
    cfg = cfglib.tiny_llm("mistral")
    params = jllm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm_params(params, bits=8)
    deq = dict(params)
    deq = {**params, "layers": quant.materialize_quantized(
        qparams)["layers"]}

    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8))
    e = jllm.embed_tokens(params, jnp.asarray(ids))
    h_ref, _ = jllm.forward(params, cfg, e, jnp.arange(8)[None],
                            jnp.array([8]), attn_impl="xla")
    h_q, _ = jllm.forward(deq, cfg, e, jnp.arange(8)[None],
                          jnp.array([8]), attn_impl="xla")
    ref = np.asarray(jllm.lm_logits(params, cfg, h_ref))
    got = np.asarray(jllm.lm_logits(deq, cfg, h_q))
    # int8 weight error ~0.4%: logits track within loose tolerance
    assert np.abs(ref - got).max() < 0.5
    assert np.argmax(ref[0, -1]) == np.argmax(got[0, -1]) or \
        np.corrcoef(ref[0, -1], got[0, -1])[0, 1] > 0.99
