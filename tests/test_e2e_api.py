"""Public-API end-to-end test: model_init -> processor -> mm_infer.

Drives the full reference quickstart flow (README.md:300-337) against a tiny
random checkpoint in the reference's HF on-disk format, exercising the
checkpoint converter, media pipeline, tokenizer/chat template, splice, and
the generation engine together.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from make_tiny_checkpoint import build_checkpoint
    d = tmp_path_factory.mktemp("ckpt")
    return build_checkpoint(str(d))


@pytest.fixture(scope="module")
def loaded(ckpt):
    import jax.numpy as jnp
    import videollama2_tpu
    return videollama2_tpu.model_init(ckpt, dtype=jnp.float32, max_len=256,
                                      buckets=(128,), attn_impl="xla")


def test_model_init_shapes(loaded):
    model, processor, tokenizer = loaded
    assert model.model_type == "videollama2_mistral"
    assert set(processor.keys()) == {"image", "video"}
    assert tokenizer.eos_token == "</s>"


def test_mm_infer_video(loaded, tmp_path):
    import videollama2_tpu
    model, processor, tokenizer = loaded
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (64, 48, 3),
                                           dtype=np.uint8))
              for _ in range(10)]
    gif = tmp_path / "v.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:], duration=50)

    tensor = processor["video"](str(gif))
    assert tensor.shape == (model.config.num_frames,
                            model.config.vision.image_size,
                            model.config.vision.image_size, 3)
    out = videollama2_tpu.mm_infer(tensor, "What happens ?", model,
                                   tokenizer, modal="video",
                                   max_new_tokens=8)
    assert isinstance(out, str) and len(out) > 0


def test_model_init_i420_wire(loaded, ckpt, tmp_path):
    """model_init(wire="i420") makes the processors emit planar YUV 4:2:0
    (media/wire.py — half the host->device bytes) and mm_infer consumes it
    through the same engine as the RGB wire."""
    import jax.numpy as jnp
    import videollama2_tpu
    model, processor, tokenizer = videollama2_tpu.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(128,),
        attn_impl="xla", wire="i420")
    H = model.config.vision.image_size
    rng = np.random.default_rng(1)
    frames = [Image.fromarray(rng.integers(0, 255, (64, 48, 3),
                                           dtype=np.uint8))
              for _ in range(10)]
    gif = tmp_path / "w.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:], duration=50)

    tensor = processor["video"](str(gif))
    assert tensor.dtype == np.uint8
    assert tensor.shape == (model.config.num_frames, H * 3 // 2, H)
    out = videollama2_tpu.mm_infer(tensor, "What happens ?", model,
                                   tokenizer, modal="video",
                                   max_new_tokens=8)
    assert isinstance(out, str) and len(out) > 0

    img = processor["image"](Image.fromarray(
        rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)))
    assert img.shape == (1, H * 3 // 2, H)
    out = videollama2_tpu.mm_infer(img, "Describe .", model, tokenizer,
                                   modal="image", max_new_tokens=6)
    assert isinstance(out, str) and len(out) > 0

    with pytest.raises(ValueError):
        videollama2_tpu.model_init(ckpt, dtype=jnp.float32, wire="bogus")


def test_i420_wire_container_takes_native_route(ckpt, tmp_path):
    """For CONTAINER video paths, the wire='i420' processor must route
    through media.preprocess.process_video_i420 (C++ decode -> scale/crop
    in YUV -> packed wire buffer, no host RGB) — byte-identical to calling
    it directly — while the GIF/ndarray fallback (rgb_to_i420 over the PIL
    path) stays available for s/e clipping kwargs and non-container
    sources (inference/api._apply_wire.wrap_video)."""
    import jax.numpy as jnp
    import videollama2_tpu
    from videollama2_tpu.media.preprocess import process_video_i420

    from avi_writer import write_avi

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (6, 40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "clip.avi")
    write_avi(p, frames, fps=5)

    model, processor, tokenizer = videollama2_tpu.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(128,),
        attn_impl="xla", wire="i420")
    cfg = model.config
    got = processor["video"](p)
    want = process_video_i420(p, cfg.vision, num_frames=cfg.num_frames)
    assert got.dtype == np.uint8
    assert got.shape == (cfg.num_frames,
                         cfg.vision.image_size * 3 // 2,
                         cfg.vision.image_size)
    np.testing.assert_array_equal(got, want)

    out = videollama2_tpu.mm_infer(got, "What happens ?", model, tokenizer,
                                   modal="video", max_new_tokens=6)
    assert isinstance(out, str) and len(out) > 0


def test_mm_infer_text_deterministic(loaded):
    import videollama2_tpu
    model, _, tokenizer = loaded
    a = videollama2_tpu.mm_infer(None, "Say yes .", model, tokenizer,
                                 modal="text", max_new_tokens=6)
    b = videollama2_tpu.mm_infer(None, "Say yes .", model, tokenizer,
                                 modal="text", max_new_tokens=6)
    assert a == b  # greedy decode is deterministic


@pytest.mark.parametrize("kw", [{"load_8bit": True}, {"load_4bit": True}])
def test_model_init_quantized(ckpt, kw):
    """model_init(load_8bit/load_4bit) quantizes the LLM on load (the
    reference's bitsandbytes serving flags, model/__init__.py:48,59-69)
    and still generates."""
    import jax.numpy as jnp
    import videollama2_tpu
    model, processor, tokenizer = videollama2_tpu.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(128,),
        attn_impl="xla", **kw)
    key = "kernel_q8" if kw.get("load_8bit") else "kernel_q4"
    layers = model.engine.params["llm"]["layers"]
    # single-chip quantized serving fuses q/k/v (ops/quant.fuse_qkv)
    assert key in layers["qkv"] and "q" not in layers
    assert key in layers["o"]
    out = videollama2_tpu.mm_infer(None, "Hi?", model, tokenizer,
                                   modal="text", do_sample=False)
    assert isinstance(out, str) and out
