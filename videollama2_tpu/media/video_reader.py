"""Video frame extraction: ctypes binding over the C++ libavcodec decoder.

Replaces decord (reference mm_utils.py:154-177). The shared library is built
from media/csrc/video_decoder.cc (`make -C videollama2_tpu/media/csrc`); if it
is missing or the container is unsupported we fall back to imageio (GIFs) /
PIL (frame directories).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

from . import sampler as sampler_lib

_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_LIB_DIR, "libvideodec.so")
_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:  # build on first use
                subprocess.run(["make", "-C", _LIB_DIR], check=True,
                               capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_num_frames.restype = ctypes.c_long
        lib.vd_num_frames.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_width.restype = ctypes.c_int
        lib.vd_width.argtypes = [ctypes.c_void_p]
        lib.vd_height.restype = ctypes.c_int
        lib.vd_height.argtypes = [ctypes.c_void_p]
        lib.vd_get_batch.restype = ctypes.c_int
        lib.vd_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.vd_get_batch_i420.restype = ctypes.c_int
        lib.vd_get_batch_i420.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        lib.ad_decode.restype = ctypes.c_long
        lib.ad_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.ad_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.ad_has_audio.restype = ctypes.c_int
        lib.ad_has_audio.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


class VideoReader:
    """decord.VideoReader-equivalent over the C++ decoder."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libvideodec.so unavailable")
        self._lib = lib
        self._ctx = lib.vd_open(path.encode())
        if not self._ctx:
            raise IOError(f"cannot open video: {path}")
        self.num_frames = int(lib.vd_num_frames(self._ctx))
        self.fps = float(lib.vd_fps(self._ctx))
        self.width = int(lib.vd_width(self._ctx))
        self.height = int(lib.vd_height(self._ctx))

    def __len__(self) -> int:
        return self.num_frames

    def get_avg_fps(self) -> float:
        return self.fps

    def _decode_batch(self, indices: Sequence[int], frame_shape, call):
        """Shared batch plumbing: sorted-index decode via `call(idx_ptr, n,
        out_ptr)`, original-order restore, truncated-stream padding."""
        idx = np.asarray(sorted(int(i) for i in indices), dtype=np.int64)
        order = np.argsort(np.argsort([int(i) for i in indices]))
        out = np.empty((len(idx),) + frame_shape, dtype=np.uint8)
        n = call(idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(idx),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if n < len(idx):
            # truncated stream: repeat last decoded frame (decord-compatible
            # behavior is to error; we degrade gracefully like train.py's
            # corrupt-sample retry path expects)
            if n == 0:
                raise IOError("failed to decode any frames")
            out[n:] = out[n - 1]
        return out[order] if not np.all(order == np.arange(len(idx))) else out

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """Decode frames at `indices` -> [N, H, W, 3] uint8 (RGB)."""
        return self._decode_batch(
            indices, (self.height, self.width, 3),
            lambda ip, n, op: self._lib.vd_get_batch(self._ctx, ip, n, op))

    def get_batch_i420(self, indices: Sequence[int], size: int,
                       clip_crop: bool = True) -> np.ndarray:
        """Decode frames at `indices`, scale (+ center-crop for CLIP
        semantics when clip_crop) straight to packed FULL-RANGE I420 at
        (size x size) in C++ — the host->device wire buffer (media/wire.py)
        with no host RGB round trip. Returns [N, size*3/2, size] uint8."""
        if size % 4:
            raise ValueError(f"I420 size must be a multiple of 4: {size}")
        return self._decode_batch(
            indices, (size * 3 // 2, size),
            lambda ip, n, op: self._lib.vd_get_batch_i420(
                self._ctx, ip, n, size, int(clip_crop), op))

    def close(self):
        if getattr(self, "_ctx", None):
            self._lib.vd_close(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Decode a container's audio track -> [n] float32 mono at sample_rate.

    The VideoLLaMA2.1-AV workload consumes the audio stream of the video
    file itself (reference README.md:130-132): libavcodec decode +
    libswresample to mono float at the BEATs rate, in the C++ library
    (media/csrc/video_decoder.cc ad_decode). Raises IOError when the
    container has no decodable audio stream.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("libvideodec.so unavailable")
    buf = ctypes.POINTER(ctypes.c_float)()
    n = lib.ad_decode(path.encode(), int(sample_rate), ctypes.byref(buf))
    if n < 0 or not buf:
        raise IOError(f"no decodable audio track in {path}")
    try:
        return np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.ad_free(buf)


def has_audio(path: str) -> bool:
    """True when the container carries a decodable audio stream."""
    lib = _load_lib()
    if lib is None or not os.path.isfile(path):
        return False
    return bool(lib.ad_has_audio(path.encode()))


def _read_gif(path: str) -> List[np.ndarray]:
    import imageio
    frames = []
    for frame in imageio.get_reader(path):
        arr = np.asarray(frame)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        elif arr.shape[-1] == 4:
            arr = arr[..., :3]
        frames.append(arr)
    return frames


def probe_video(video_path: str):
    """-> (num_frames, fps) for any supported container (file/dir/gif),
    using the same fps conventions as read_video_frames."""
    if os.path.isdir(video_path):
        return len(sorted(os.listdir(video_path))), 3.0
    if video_path.endswith(".gif"):
        return len(_read_gif(video_path)), 25.0
    vr = VideoReader(video_path)
    try:
        return len(vr), vr.get_avg_fps()
    finally:
        vr.close()


def read_video_frames(video_path: str, num_frames: Optional[int],
                      s: Optional[float] = None,
                      e: Optional[float] = None) -> List[np.ndarray]:
    """Open a video (file/dir/gif), sample indices with reference parity,
    decode only those frames. Mirrors mm_utils.py:142-177."""
    if os.path.isdir(video_path):
        frame_files = sorted(os.listdir(video_path))
        fps, total = 3, len(frame_files)
        idx = sampler_lib.sample_indices(total, fps, num_frames, s, e)
        from PIL import Image
        return [np.asarray(Image.open(
            os.path.join(video_path, frame_files[i])).convert("RGB"))
            for i in idx]
    if video_path.endswith(".gif"):
        all_frames = _read_gif(video_path)
        fps, total = 25, len(all_frames)
        idx = sampler_lib.sample_indices(total, fps, num_frames, s, e)
        return [all_frames[i] for i in idx]
    vr = VideoReader(video_path)
    try:
        idx = sampler_lib.sample_indices(len(vr), vr.get_avg_fps(),
                                         num_frames, s, e)
        batch = vr.get_batch(idx)
    finally:
        vr.close()
    return list(batch)
