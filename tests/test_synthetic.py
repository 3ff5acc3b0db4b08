"""utils/synthetic: benchmark weight trees must load and generate.

The TPU benches (bench.py, scripts/bench_{speculative,session}.py) build
their int8 trees through this module; a structure drift would only surface
on the real chip mid-measurement, so pin it here on CPU at tiny scale.
"""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.inference.engine import Engine, GenerationConfig
from videollama2_tpu.utils import synthetic


def test_synthetic_int8_tree_generates():
    cfg = cfglib.tiny_model()
    params = synthetic.synthetic_model_params(
        cfg, dtype=jnp.float32, quantize_llm=True, quantize_vision=True)
    layers = params["llm"]["layers"]
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        assert "kernel_q8" in layers[name] and "kernel" not in layers[name]
        assert layers[name]["kernel_q8"]["q"].dtype == jnp.int8
    for name in ("fc1", "fc2"):
        assert "kernel_q8" in params["vision"]["layers"][name]

    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    frames = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    out = eng.generate([[3, VIDEO_TOKEN_INDEX, 5]], frames=frames,
                       gen=GenerationConfig(max_new_tokens=4),
                       eos_token_id=-1)
    assert len(out[0]) == 4


def test_synthetic_embed_quantization():
    cfg = cfglib.tiny_model("videollama2_qwen2")
    params = synthetic.synthetic_model_params(
        cfg, dtype=jnp.float32, quantize_llm=True, quantize_embed=True)
    assert "weight_q8" in params["llm"]["embed"]
    assert "kernel_q8" in params["llm"]["lm_head"]
    # structure matches what the bench builds: scales fp32, q int8
    eq = params["llm"]["embed"]["weight_q8"]
    assert eq["q"].dtype == jnp.int8 and eq["scale"].dtype == jnp.float32


def test_synthetic_matches_eval_shape_when_unquantized():
    from videollama2_tpu.models import videollama2 as vl2
    cfg = cfglib.tiny_model()
    params = synthetic.synthetic_model_params(cfg, dtype=jnp.float32,
                                              quantize_llm=False)
    ref = jax.eval_shape(lambda: vl2.init_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    got = jax.tree.map(np.shape, params)
    want = jax.tree.map(lambda a: tuple(a.shape), ref)
    assert jax.tree.structure(got) == jax.tree.structure(want)
    assert jax.tree.leaves(got) == jax.tree.leaves(want)


def test_synthetic_quant_layout_matches_real_quantizer():
    """The synthetic int8/int4 pack layouts must be EXACTLY what
    ops/quant.quantize_llm_params emits — a drift means the bench measures
    shapes the serving path never runs."""
    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.ops import quant

    cfg = cfglib.tiny_llm()
    params = llm_lib.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    abstract = jax.eval_shape(lambda: llm_lib.init_params(
        jax.random.PRNGKey(0), cfg, jnp.float32))
    for bits in (8, 4):
        real = jax.eval_shape(
            lambda: quant.quantize_llm_params(params, bits=bits))
        synth = synthetic.quantized_llm_abstract(abstract, bits=bits)
        got = jax.tree.map(lambda a: (tuple(a.shape), str(a.dtype)), synth)
        want = jax.tree.map(lambda a: (tuple(a.shape), str(a.dtype)), real)
        assert jax.tree.structure(got) == jax.tree.structure(want), bits
        assert jax.tree.leaves(got) == jax.tree.leaves(want), bits


def test_synthetic_int4_tree_generates():
    """llm_bits=4 trees drive the engine end-to-end (BENCH_BITS=4 path:
    W4A8 prefill via ops/layers.dense + int4 Pallas decode kernels)."""
    cfg = cfglib.tiny_model()
    params = synthetic.synthetic_model_params(
        cfg, dtype=jnp.float32, quantize_llm=True, llm_bits=4)
    layers = params["llm"]["layers"]
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        assert "kernel_q4" in layers[name] and "kernel" not in layers[name]
        assert layers[name]["kernel_q4"]["q4"].dtype == jnp.int8

    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    frames = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    out = eng.generate([[3, VIDEO_TOKEN_INDEX, 5]], frames=frames,
                       gen=GenerationConfig(max_new_tokens=4),
                       eos_token_id=-1)
    assert len(out[0]) == 4
