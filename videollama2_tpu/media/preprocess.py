"""Image/video preprocessing: pad, resize, normalize.

Parity: videollama2/mm_utils.py:27-38 (expand2square), :91-103 (process_image),
:132-202 (process_video) and the HF CLIPImageProcessor / SiglipImageProcessor
`preprocess` they delegate to:

  * CLIP: resize shortest edge -> `image_size` (bicubic) + center crop,
    rescale 1/255, normalize with CLIP mean/std.
  * SigLIP: direct resize to (image_size, image_size) (bicubic), rescale,
    normalize with (0.5, 0.5, 0.5).

CPU path uses PIL (bit-parity with HF's PIL-backed processors). The
production inference path ships `out_dtype="uint8"`: resize/pad stay
host-side (PIL resizes uint8 natively), the `(x/255 - mean)/std` normalize
fuses into the tower's first conv ON DEVICE (models/videollama2.encode_frames
uint8 branch) — 4x less host->HBM traffic than fp32, numerically identical
because PIL's resize output is uint8 in both paths.

Outputs are channels-last [T, H, W, 3] — the TPU-native layout
(torch reference uses [T, 3, H, W]).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..constants import MAX_FRAMES, NUM_FRAMES
from ..core.config import VisionConfig


def expand2square(pil_img: Image.Image,
                  background_color: Tuple[int, int, int]) -> Image.Image:
    """Pad to square with the dataset mean color (mm_utils.py:27-38)."""
    width, height = pil_img.size
    if width == height:
        return pil_img
    if width > height:
        result = Image.new(pil_img.mode, (width, width), background_color)
        result.paste(pil_img, (0, (width - height) // 2))
        return result
    result = Image.new(pil_img.mode, (height, height), background_color)
    result.paste(pil_img, ((height - width) // 2, 0))
    return result


def _resize_clip(img: Image.Image, size: int) -> Image.Image:
    """HF CLIPImageProcessor: shortest-edge resize + center crop."""
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = size
    new_long = int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((nw, nh), Image.BICUBIC)
    # center crop to (size, size)
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


def _resize_siglip(img: Image.Image, size: int) -> Image.Image:
    return img.resize((size, size), Image.BICUBIC)


def preprocess_frames(frames: Sequence[Image.Image], cfg: VisionConfig,
                      aspect_ratio: Optional[str] = None,
                      out_dtype: str = "float32") -> np.ndarray:
    """PIL frames -> [T, H, W, 3].

    out_dtype "float32": normalized floats (HF-processor numeric parity).
    out_dtype "uint8": resized raw RGB — normalization happens on device
    (encode_frames), shipping 4x fewer host->HBM bytes. Identical numerics:
    the float path normalizes the very same uint8 resize output.
    """
    mean = np.asarray(cfg.image_mean, dtype=np.float32)
    std = np.asarray(cfg.image_std, dtype=np.float32)
    out = []
    for f in frames:
        if f.mode != "RGB":
            f = f.convert("RGB")
        if aspect_ratio == "pad":
            f = expand2square(f, tuple(int(x * 255) for x in cfg.image_mean))
        if cfg.variant == "clip":
            f = _resize_clip(f, cfg.image_size)
        else:
            f = _resize_siglip(f, cfg.image_size)
        if out_dtype == "uint8":
            out.append(np.asarray(f, dtype=np.uint8))
        else:
            arr = np.asarray(f, dtype=np.float32) / 255.0
            out.append((arr - mean) / std)
    return np.stack(out, axis=0)


def create_photo_grid(arr, rows: Optional[int] = None,
                      cols: Optional[int] = None) -> np.ndarray:
    """Arrange t frames into a (rows x cols) photo grid.

    Parity: mm_utils.py:41-88 exactly — rows = ceil(sqrt(t)), cols =
    ceil(t / rows) (NOT a square grid: t=2 gives 2x1), row-major fill,
    black padding cells, list-of-frames input accepted.
    """
    if isinstance(arr, list):
        arr = np.stack([np.asarray(a) for a in arr])
    t, h, w, c = arr.shape
    if rows is None and cols is None:
        rows = int(np.ceil(np.sqrt(t)))
        cols = int(np.ceil(t / rows))
    elif rows is None:
        rows = int(np.ceil(t / cols))
    elif cols is None:
        cols = int(np.ceil(t / rows))
    if rows * cols < t:
        raise ValueError(f"Not enough grid cells ({rows}x{cols}) to hold "
                         f"all images ({t}).")
    num_pad = rows * cols - t
    if num_pad > 0:
        pad = np.zeros((num_pad, h, w, c), dtype=arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    return (arr.reshape(rows, cols, h, w, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * h, cols * w, c))


def process_image(image_path, cfg: VisionConfig,
                  aspect_ratio: Optional[str] = "pad",
                  out_dtype: str = "float32") -> np.ndarray:
    """Parity: mm_utils.py:91-103. Returns [1, H, W, 3]."""
    if isinstance(image_path, Image.Image):
        image = image_path.convert("RGB")
    elif isinstance(image_path, np.ndarray):
        image = Image.fromarray(image_path).convert("RGB")
    else:
        image = Image.open(image_path).convert("RGB")
    return preprocess_frames([image], cfg, aspect_ratio, out_dtype)


def process_video(video_path, cfg: VisionConfig, s: Optional[float] = None,
                  e: Optional[float] = None,
                  aspect_ratio: Optional[str] = "pad",
                  num_frames: Optional[int] = NUM_FRAMES,
                  out_dtype: str = "float32") -> np.ndarray:
    """Parity: mm_utils.py:132-202. Returns [T, H, W, 3].

    Accepts a path (file/dir/gif), ndarray stack, or list of frames. Decoding
    goes through media.video_reader (C++ libavcodec decoder with Python
    fallbacks — the decord replacement).
    """
    from . import video_reader

    if isinstance(video_path, str):
        frames = video_reader.read_video_frames(video_path, num_frames=num_frames,
                                                s=s, e=e)
        video_data = [Image.fromarray(f) for f in frames]
    elif isinstance(video_path, np.ndarray):
        video_data = [Image.fromarray(f) for f in video_path]
    elif isinstance(video_path, list) and isinstance(video_path[0], np.ndarray):
        video_data = [Image.fromarray(f) for f in video_path]
    elif isinstance(video_path, list) and isinstance(video_path[0], str):
        video_data = [Image.open(f) for f in video_path]
    elif isinstance(video_path, list) and isinstance(video_path[0],
                                                     Image.Image):
        video_data = video_path
    else:
        raise ValueError(f"Unsupported video path type: {type(video_path)}")

    # zero-frame padding for short videos (mm_utils.py:190-192)
    while num_frames is not None and len(video_data) < num_frames:
        video_data.append(Image.fromarray(
            np.zeros((*video_data[-1].size, 3), dtype=np.uint8)))
    video_data = video_data[:MAX_FRAMES]  # (mm_utils.py:193-194)

    return preprocess_frames(video_data, cfg, aspect_ratio, out_dtype)


def process_video_i420(video_path, cfg: VisionConfig,
                       s: Optional[float] = None, e: Optional[float] = None,
                       num_frames: Optional[int] = NUM_FRAMES) -> np.ndarray:
    """process_video for the I420 wire: returns packed planar YUV 4:2:0
    [T, image_size*3/2, image_size] uint8 (media/wire.py layout).

    For container paths with the C++ decoder available, the frames never
    touch RGB on the host: media/csrc vd_get_batch_i420 scales (and
    center-crops, CLIP semantics) straight from the stream's native YUV and
    range-converts to full range — half the wire bytes AND most of the
    host-side resize/convert CPU of the RGB path. The resize is swscale
    bicubic in YUV space, and the center-crop offset rounds DOWN to even
    (4:2:0 chroma siting needs x0/y0 % 2 == 0), up to 1 px left/up of
    PIL's exact center — both documented deltas vs PIL-on-RGB (PARITY.md;
    use process_video + wire.rgb_to_i420 — or wire='rgb' — for PIL-exact
    pixels). GIF / frame-dir / ndarray inputs fall back to the PIL path +
    rgb_to_i420 pack (identical wire layout).
    """
    from . import video_reader, wire

    if (isinstance(video_path, str) and not os.path.isdir(video_path)
            and not video_path.endswith(".gif")):
        try:
            vr = video_reader.VideoReader(video_path)
        except (RuntimeError, IOError):
            vr = None
        if vr is not None:
            try:
                from . import sampler as sampler_lib
                idx = sampler_lib.sample_indices(len(vr), vr.get_avg_fps(),
                                                 num_frames, s, e)
                buf = vr.get_batch_i420(idx, cfg.image_size,
                                        clip_crop=(cfg.variant == "clip"))
            finally:
                vr.close()
            S = cfg.image_size
            if num_frames is not None and buf.shape[0] < num_frames:
                # short-video padding parity (mm_utils.py:190-192): black
                # frames — in full-range I420 that is Y=0, U=V=128 (an
                # all-zeros pad would decode to green)
                pad = np.zeros((num_frames - buf.shape[0], S * 3 // 2, S),
                               dtype=np.uint8)
                pad[:, S:] = 128
                buf = np.concatenate([buf, pad], axis=0)
            return buf[:MAX_FRAMES]

    rgb = process_video(video_path, cfg, s=s, e=e, aspect_ratio=None,
                        num_frames=num_frames, out_dtype="uint8")
    return wire.rgb_to_i420(rgb)
