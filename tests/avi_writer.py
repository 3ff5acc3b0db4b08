"""Minimal AVI muxer (pure Python): uncompressed RGB video + PCM audio.

Offline test infrastructure: the environment has no ffmpeg binary or
encoder bindings, but exercising the C++ container-audio decode path
(media/csrc/video_decoder.cc ad_decode — the VideoLLaMA2.1-AV "audio from
the video file itself" ingestion, reference README.md:130-132) needs a real
video container WITH an audio track. AVI with DIB ('00db') frames and
16-bit PCM ('01wb') needs no encoder at all and libavformat demuxes it
natively, so fixtures are built here byte-by-byte (RIFF chunks).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_avi(path: str, frames: np.ndarray, audio=None,
              fps: int = 5, sample_rate: int = 16000) -> None:
    """frames: [N, H, W, 3] uint8 RGB; audio: [S] float in [-1, 1] or None
    for a video-only container (exercises the no-audio-track paths)."""
    frames = np.asarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    pcm = (b"" if audio is None else
           (np.clip(np.asarray(audio, np.float64), -1, 1)
            * 32767).astype("<i2").tobytes())
    row_bytes = (w * 3 + 3) & ~3
    frame_bytes = row_bytes * h
    n_streams = 2 if audio is not None else 1

    avih = _chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # HASINDEX
        n, 0, n_streams, frame_bytes, w, h, 0, 0, 0, 0))

    strh_v = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIii4H", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, n, frame_bytes, -1, 0, 0, 0, w, h))
    strf_v = _chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0))
    strl_v = _list(b"strl", strh_v + strf_v)

    block_align = 2  # mono s16
    strl_a = b""
    if audio is not None:
        strh_a = _chunk(b"strh", struct.pack(
            "<4s4sIHHIIIIIIii4H", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, sample_rate, 0, len(pcm) // block_align, len(pcm), -1,
            block_align, 0, 0, 0, 0))
        strf_a = _chunk(b"strf", struct.pack(
            "<HHIIHH", 1, 1, sample_rate, sample_rate * block_align,
            block_align, 16))
        strl_a = _list(b"strl", strh_a + strf_a)

    hdrl = _list(b"hdrl", avih + strl_v + strl_a)

    # movi: interleave one audio slice after each video frame
    movi_payload = b""
    index = []  # (fourcc, offset-from-movi-fourcc, size)
    samples_per_frame = (len(pcm) // block_align + n - 1) // n if pcm else 0
    for i in range(n):
        # DIB frames are bottom-up BGR with 4-byte-aligned rows
        rgb = frames[i][::-1, :, ::-1]
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, :w * 3] = rgb.reshape(h, w * 3)
        data = rows.tobytes()
        index.append((b"00db", 4 + len(movi_payload), len(data)))
        movi_payload += _chunk(b"00db", data)
        a0 = i * samples_per_frame * block_align
        a1 = min(len(pcm), (i + 1) * samples_per_frame * block_align)
        if a1 > a0:
            index.append((b"01wb", 4 + len(movi_payload), a1 - a0))
            movi_payload += _chunk(b"01wb", pcm[a0:a1])
    movi = _list(b"movi", movi_payload)

    idx1 = _chunk(b"idx1", b"".join(
        fcc + struct.pack("<III", 0x10, off, size)
        for fcc, off, size in index))

    riff = _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)
    with open(path, "wb") as f:
        f.write(riff)
