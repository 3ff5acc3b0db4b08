"""I420 wire format (media/wire.py + the device unpack in
models/videollama2._i420_to_rgb).

The serving fast path may ship frames host->device as planar YUV 4:2:0
(1.5 bytes/px) instead of uint8 RGB (3 bytes/px); the color conversion runs
on device fused into the tower normalize. These tests pin:
  * host pack / numpy unpack round-trip bounds (lossy only in chroma),
  * exactness on 2x2-flat-chroma images (the 4:2:0 sites lose nothing),
  * device unpack == numpy reference bit-for-bit math,
  * encode_frames(I420) ~= encode_frames(RGB) features, and Engine
    generate() token parity on chroma-flat frames.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.media import wire


def _rand_rgb(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 255, shape,
                                                dtype=np.uint8)


def test_i420_shapes_and_dtype():
    fr = _rand_rgb((2, 3, 8, 12, 3))
    buf = wire.rgb_to_i420(fr)
    assert buf.shape == (2, 3, 12, 12) and buf.dtype == np.uint8
    rgb = wire.i420_to_rgb(buf)
    assert rgb.shape == (2, 3, 8, 12, 3) and rgb.dtype == np.float32


def test_i420_rejects_odd_dims_and_bad_dtype():
    with pytest.raises(ValueError):
        wire.rgb_to_i420(_rand_rgb((1, 7, 8, 3)))
    with pytest.raises(ValueError):
        # even but not a multiple of 4: the U plane would not ravel into
        # whole W-wide rows
        wire.rgb_to_i420(_rand_rgb((1, 6, 8, 3)))
    with pytest.raises(ValueError):
        wire.rgb_to_i420(_rand_rgb((1, 8, 8, 3)).astype(np.float32))


def test_i420_luma_roundtrip_tight():
    """Y is full-resolution: grayscale images round-trip to +-1/255."""
    g = np.random.default_rng(1).integers(0, 255, (4, 16, 16), dtype=np.uint8)
    fr = np.stack([g] * 3, axis=-1)
    back = wire.i420_to_rgb(wire.rgb_to_i420(fr))
    assert np.max(np.abs(back - fr.astype(np.float32))) <= 1.5


def test_i420_flat_chroma_blocks_exact():
    """Frames whose 2x2 quads are constant lose nothing to the 4:2:0
    subsample: round trip is exact to uint8 rounding (+-1)."""
    rng = np.random.default_rng(2)
    small = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    fr = small.repeat(2, axis=1).repeat(2, axis=2)  # [2, 16, 16, 3]
    back = wire.i420_to_rgb(wire.rgb_to_i420(fr))
    assert np.max(np.abs(back - fr.astype(np.float32))) <= 1.5


def test_i420_natural_error_bounded():
    """Arbitrary (worst-case random) chroma: error bounded by the box
    filter's smoothing, and zero mean shift (same matrix both ways)."""
    fr = _rand_rgb((2, 16, 16, 3), seed=3)
    back = wire.i420_to_rgb(wire.rgb_to_i420(fr))
    diff = back - fr.astype(np.float32)
    assert abs(float(diff.mean())) < 2.0
    # uncorrelated per-pixel chroma is the pathological worst case for
    # 4:2:0 (real video never has it — the SOURCE was 4:2:0); measured
    # absmax ~205 / absmean ~42 here, documented as the ceiling
    assert float(np.abs(diff).max()) < 230.0
    assert float(np.abs(diff).mean()) < 55.0
    # luma channelwise mean is preserved (box filter is mean-preserving)
    y_back = back @ np.array([0.299, 0.587, 0.114], np.float32)
    y_src = fr.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                             np.float32)
    assert float(np.abs(y_back - y_src).mean()) < 2.0


def test_device_unpack_matches_numpy():
    from videollama2_tpu.models.videollama2 import _i420_to_rgb
    buf = np.random.default_rng(4).integers(
        0, 255, (2, 3, 18, 12), dtype=np.uint8)
    ref = wire.i420_to_rgb(buf)
    dev = np.asarray(_i420_to_rgb(jnp.asarray(buf)))
    np.testing.assert_allclose(dev, ref, atol=1e-3)


def test_encode_frames_i420_matches_rgb():
    """encode_frames on an I420 buffer == encode_frames on the RGB frames
    that buffer decodes to (the conversion itself is the only delta)."""
    from videollama2_tpu.models import videollama2 as vl2
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(5)
    small = rng.integers(0, 255, (1, T, H // 2, H // 2, 3), dtype=np.uint8)
    fr = small.repeat(2, axis=2).repeat(2, axis=3)  # chroma-flat quads
    buf = wire.rgb_to_i420(fr)

    tok_rgb = vl2.encode_frames(params, cfg, jnp.asarray(fr),
                                attn_impl="xla")
    tok_yuv = vl2.encode_frames(params, cfg, jnp.asarray(buf),
                                attn_impl="xla")
    # chroma-flat quads round-trip to +-1/255 pixel error -> tiny feature
    # delta through the random tiny tower
    err = float(jnp.max(jnp.abs(tok_rgb - tok_yuv)))
    scale = float(jnp.max(jnp.abs(tok_rgb))) + 1e-6
    assert err / scale < 0.15, f"feature drift {err / scale}"


def _write_avi(path, frames):
    from avi_writer import write_avi
    write_avi(path, frames, fps=5)


def test_cxx_i420_full_range_roundtrip(tmp_path):
    """media/csrc vd_get_batch_i420: decode -> scale/crop in YUV -> packed
    FULL-RANGE I420, no host RGB. Solid colors must round-trip tightly —
    this is the test that catches limited-range leakage (a wrong dstRange
    clips 255 -> ~236 on saturated primaries)."""
    from videollama2_tpu.media import video_reader
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (128, 128, 128), (200, 50, 120)]
    frames = np.stack([np.full((32, 64, 3), c, np.uint8) for c in colors])
    p = str(tmp_path / "solid.avi")
    _write_avi(p, frames)
    vr = video_reader.VideoReader(p)
    try:
        buf = vr.get_batch_i420(list(range(len(colors))), 32,
                                clip_crop=True)
    finally:
        vr.close()
    assert buf.shape == (5, 48, 32) and buf.dtype == np.uint8
    rgb = wire.i420_to_rgb(buf)
    for i, c in enumerate(colors):
        err = np.abs(rgb[i] - np.asarray(c, np.float32)).max()
        assert err <= 3.0, (c, err)


def test_cxx_i420_clip_center_crop(tmp_path):
    """clip_crop=1 reproduces CLIP shortest-edge + center-crop semantics:
    the centered min(W,H) square is what survives."""
    from videollama2_tpu.media import video_reader
    band = np.full((32, 64, 3), (255, 0, 0), np.uint8)
    band[:, 16:48] = (0, 255, 0)  # the centered 32x32 square is green
    p = str(tmp_path / "band.avi")
    _write_avi(p, np.stack([band] * 2))
    vr = video_reader.VideoReader(p)
    try:
        crop = wire.i420_to_rgb(vr.get_batch_i420([0], 32))[0]
        stretch = wire.i420_to_rgb(
            vr.get_batch_i420([0], 32, clip_crop=False))[0]
    finally:
        vr.close()
    assert np.abs(crop.reshape(-1, 3).mean(0)
                  - np.array([0, 255, 0])).max() < 4.0
    # stretch keeps the red side bands -> red mean well above zero
    assert stretch.reshape(-1, 3).mean(0)[0] > 60.0


def test_cxx_i420_limited_range_same_size(tmp_path):
    """Limited-range YUV sources whose dims already equal the target hit
    swscale's unscaled planar copy, which silently ignores
    sws_setColorspaceDetails — the decoder must expand studio->full range
    itself (the LUT pass in write_i420). White at Y=235 must come out 255,
    not stay 235 (washed-out frames on the DEFAULT serving wire)."""
    from videollama2_tpu.media import video_reader
    S = 32
    # Y4M: raw yuv420p container, range unspecified -> limited assumed
    hdr = f"YUV4MPEG2 W{S} H{S} F5:1 Ip A1:1 C420\n".encode()
    def frame(y, u, v):
        return (b"FRAME\n" + bytes([y]) * (S * S)
                + bytes([u]) * (S * S // 4) + bytes([v]) * (S * S // 4))
    p = tmp_path / "limited.y4m"
    p.write_bytes(hdr + frame(235, 128, 128)   # studio white
                  + frame(16, 128, 128)        # studio black
                  + frame(81, 90, 240))        # studio-range red
    vr = video_reader.VideoReader(str(p))
    try:
        rgb = wire.i420_to_rgb(vr.get_batch_i420([0, 1, 2], S,
                                                 clip_crop=False))
    finally:
        vr.close()
    assert np.abs(rgb[0] - 255.0).max() <= 2.0, rgb[0].mean((0, 1))
    assert np.abs(rgb[1]).max() <= 2.0, rgb[1].mean((0, 1))
    red = rgb[2].reshape(-1, 3).mean(0)
    assert red[0] > 240 and red[1] < 25 and red[2] < 25, red


def test_cxx_i420_close_to_pil_path(tmp_path):
    """The native YUV-space resize tracks the PIL-RGB-bicubic path within a
    loose tolerance on smooth content (documented delta, PARITY.md)."""
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.media import preprocess as prep
    rng = np.random.default_rng(7)
    base = rng.integers(40, 216, (3, 6, 6, 3), dtype=np.uint8)
    # smooth 48x96 frames (PIL bicubic upsample of a tiny seed)
    from PIL import Image
    frames = np.stack([np.asarray(Image.fromarray(b).resize(
        (96, 48), Image.BICUBIC)) for b in base])
    p = str(tmp_path / "smooth.avi")
    _write_avi(p, frames)
    cfg = cfglib.tiny_model().vision  # clip variant, small image size
    got = prep.process_video_i420(p, cfg, num_frames=3)
    ref = wire.rgb_to_i420(prep.process_video(
        p, cfg, aspect_ratio=None, num_frames=3, out_dtype="uint8"))
    assert got.shape == ref.shape
    d = wire.i420_to_rgb(got) - wire.i420_to_rgb(ref)
    assert np.abs(d).mean() < 8.0, np.abs(d).mean()


def test_process_video_i420_pads_black_and_falls_back(tmp_path, monkeypatch):
    """When the decoder yields fewer frames than requested, the pad rows
    are BLACK I420 (Y=0, U=V=128 — an all-zero pad decodes green); GIF
    inputs fall back to the PIL + pack path. Short-but-decodable videos
    duplicate sampled indices exactly like the RGB path (sampler parity)."""
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.media import preprocess as prep
    from videollama2_tpu.media import video_reader
    from PIL import Image
    cfg = cfglib.tiny_model().vision
    S = cfg.image_size
    frames = np.stack([np.full((32, 32, 3), 90, np.uint8)] * 2)
    p = str(tmp_path / "short.avi")
    _write_avi(p, frames)

    # duplicate-index parity with the RGB path
    out = prep.process_video_i420(p, cfg, num_frames=6)
    ref = wire.rgb_to_i420(prep.process_video(
        p, cfg, aspect_ratio=None, num_frames=6, out_dtype="uint8"))
    assert out.shape == ref.shape == (6, S * 3 // 2, S)

    # decoder-comes-up-short branch: pad must be black
    real = video_reader.VideoReader.get_batch_i420

    def truncated(self, indices, size, clip_crop=True):
        return real(self, indices, size, clip_crop)[:2]
    monkeypatch.setattr(video_reader.VideoReader, "get_batch_i420",
                        truncated)
    out3 = prep.process_video_i420(p, cfg, num_frames=6)
    assert out3.shape == (6, S * 3 // 2, S)
    assert np.abs(wire.i420_to_rgb(out3[-1:])).max() <= 2.0  # black
    monkeypatch.undo()

    gif = tmp_path / "g.gif"
    ims = [Image.fromarray(np.full((20, 20, 3), 60 + 10 * i, np.uint8))
           for i in range(4)]
    ims[0].save(str(gif), save_all=True, append_images=ims[1:], duration=50)
    out2 = prep.process_video_i420(str(gif), cfg, num_frames=4)
    assert out2.shape == (4, S * 3 // 2, S) and out2.dtype == np.uint8


def test_engine_generate_i420_token_parity():
    """Engine greedy tokens from I420 frames == from the equivalent RGB
    frames on chroma-flat inputs (the wire is transparent to decoding)."""
    from videollama2_tpu.inference.engine import Engine, GenerationConfig
    from videollama2_tpu.models import videollama2 as vl2
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(6)
    # grayscale + chroma-flat quads: Y = gray exactly, U = V = 128 exactly,
    # so the wire is mathematically lossless and both engines see the same
    # pixels to float rounding (~1e-5) — greedy tokens must match
    g = rng.integers(0, 255, (1, T, H // 2, H // 2, 1), dtype=np.uint8)
    fr = np.broadcast_to(g.repeat(2, axis=2).repeat(2, axis=3),
                         (1, T, H, H, 3)).copy()
    buf = wire.rgb_to_i420(fr)

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    prompt = [3, 4, VIDEO_TOKEN_INDEX, 5, 6]
    gen = GenerationConfig(max_new_tokens=6)
    out_rgb = eng.generate([prompt], frames=fr, gen=gen, eos_token_id=-1)
    out_yuv = eng.generate([prompt], frames=buf, gen=gen, eos_token_id=-1)
    assert out_rgb == out_yuv
