"""Round-5 serving/bench plumbing regressions.

Three paths that first ran on the real chip mid-measurement (and two of
which failed there):

  * chunked tower encode (models/videollama2._tower_features, VIT_ENCODE_
    CHUNK): what lets the B=16 int8+kv8 bench fit 16 GB — must be
    numerically identical to the whole-batch encode;
  * the `synthetic://` model_init scheme (inference/api._model_init_
    synthetic): 7B-scale serving benches load on-device constant-fill
    weights through the real worker/engine stack this way;
  * ModelWorker(preloaded=...): scripts/bench_serving.py shares ONE loaded
    bundle across its serial and dynamic-batch phases (two 7B trees
    RESOURCE_EXHAUSTED a 16 GB chip on the first TPU run).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.models import videollama2 as vl2


def test_chunked_encode_matches_whole_batch(monkeypatch):
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, T, H = 2, cfg.num_frames, cfg.vision.image_size
    frames = jnp.asarray(
        rng.integers(0, 255, (B, T, H, H, 3), dtype=np.uint8))

    monkeypatch.setenv("VIT_ENCODE_CHUNK", str(B * T))  # one whole batch
    whole = vl2.encode_frames(params, cfg, frames)
    monkeypatch.setenv("VIT_ENCODE_CHUNK", "2")         # lax.map chunks
    chunked = vl2.encode_frames(params, cfg, frames)

    # encode_frames normalizes in bf16, so chunked (lax.map) vs whole-batch
    # reduction order differs at bf16 epsilon; the test guards the reshape/
    # chunk ORDER (a bug there misplaces whole frames, not low bits)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               rtol=2e-2, atol=2e-2)


def test_chunk_divisor_adjusts_to_odd_batch(monkeypatch):
    """N not divisible by the requested chunk must still encode (the chunk
    halves until it divides; N=6, chunk=4 -> 2)."""
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    H = cfg.vision.image_size
    flat = jnp.asarray(rng.integers(0, 255, (6, H, H, 3), dtype=np.uint8))
    flat = flat.astype(jnp.float32) / 255.0

    monkeypatch.setenv("VIT_ENCODE_CHUNK", "4")
    out = vl2._tower_features(params, cfg, flat, "xla")
    monkeypatch.setenv("VIT_ENCODE_CHUNK", "6")
    ref = vl2._tower_features(params, cfg, flat, "xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    from make_tiny_checkpoint import build_checkpoint
    d = tmp_path_factory.mktemp("ckpt")
    return build_checkpoint(str(d))


def test_synthetic_scheme_model_init_and_generate(tok_dir):
    import videollama2_tpu
    model, processor, tokenizer = videollama2_tpu.model_init(
        f"synthetic://tiny?bits=8&kv_bits=8&max_len=128&tokenizer={tok_dir}",
        dtype=jnp.float32, buckets=(64,), attn_impl="xla")
    # int8 packs + quantized kv cache flags made it through the URL
    # (single-chip engines fuse q/k/v into one serving pack — ops/quant)
    layers = model.engine.params["llm"]["layers"]
    assert "kernel_q8" in layers.get("qkv", layers.get("q", {}))
    assert model.engine.kv_bits == 8
    out = videollama2_tpu.mm_infer(None, "hello there ?", model, tokenizer,
                                   modal="text", max_new_tokens=4)
    assert isinstance(out, str)


def test_synthetic_scheme_requires_tokenizer():
    import videollama2_tpu
    with pytest.raises(ValueError, match="tokenizer"):
        videollama2_tpu.model_init("synthetic://tiny?bits=8",
                                   dtype=jnp.float32)


def test_worker_preloaded_bundle_skips_model_init(tok_dir, monkeypatch):
    from videollama2_tpu.inference import api as api_lib
    from videollama2_tpu.serve import model_worker as worker_mod

    bundle = api_lib.model_init(tok_dir, dtype=jnp.float32, max_len=128,
                                buckets=(64,), attn_impl="xla")

    def boom(*a, **k):
        raise AssertionError("model_init must not be called with preloaded=")
    monkeypatch.setattr(api_lib, "model_init", boom)

    w1 = worker_mod.ModelWorker("http://x", "http://y", tok_dir,
                                model_name="b", register=False,
                                preloaded=bundle)
    w2 = worker_mod.ModelWorker("http://x", "http://y", tok_dir,
                                model_name="b", register=False,
                                dynamic_batch=True, preloaded=bundle)
    assert w1.model is bundle[0] and w2.model is bundle[0]
    assert w2.batcher is not None
