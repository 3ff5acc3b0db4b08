"""Image fast path: encode-once + feature broadcast == reference expansion."""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.inference.engine import Engine, GenerationConfig
from videollama2_tpu.constants import IMAGE_TOKEN_INDEX
from videollama2_tpu.models import videollama2 as vl2


def test_broadcast_matches_expanded():
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    H, T = cfg.vision.image_size, cfg.num_frames
    img = rng.standard_normal((1, 1, H, H, 3)).astype(np.float32)
    expanded = np.broadcast_to(img, (1, T, H, H, 3)).copy()

    a = vl2.encode_frames(params, cfg, jnp.asarray(expanded),
                          attn_impl="xla")
    b = vl2.encode_frames(params, cfg, jnp.asarray(img), attn_impl="xla",
                          broadcast_image=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_engine_image_mode_parity():
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    H, T = cfg.vision.image_size, cfg.num_frames
    img = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    img[0, 1:] = img[0, 0]  # identical frames (image expansion)
    prompt = [3, IMAGE_TOKEN_INDEX, 5]

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    gen = GenerationConfig(max_new_tokens=5)
    video_path = eng.generate([prompt], frames=img, gen=gen,
                              eos_token_id=-1)[0]
    image_path = eng.generate([prompt], frames=img, gen=gen,
                              eos_token_id=-1, image_mode=True)[0]
    assert video_path == image_path


def test_uint8_on_device_normalize_matches_host():
    import dataclasses
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    H, T = cfg.vision.image_size, cfg.num_frames
    raw = rng.integers(0, 255, (1, T, H, H, 3), dtype=np.uint8)
    mean = np.asarray(cfg.vision.image_mean, np.float32)
    std = np.asarray(cfg.vision.image_std, np.float32)
    host_norm = ((raw.astype(np.float32) / 255.0) - mean) / std

    a = vl2.encode_frames(params, cfg, jnp.asarray(host_norm),
                          attn_impl="xla")
    b = vl2.encode_frames(params, cfg, jnp.asarray(raw), attn_impl="xla")
    # device path computes in bf16: loose tolerance
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.05,
                               atol=0.05)
