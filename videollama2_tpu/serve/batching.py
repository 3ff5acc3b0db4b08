"""Dynamic request batching for the model worker.

The reference worker runs one HF `generate` per HTTP request (reference
serve/model_worker.py:271-300), so a worker's chip is utilized by exactly
one request at a time. On TPU the decode step is weight-bandwidth-bound —
batch-8 decode costs nearly the same wall clock as batch-1 — so batching
concurrent requests multiplies worker throughput ~Bx. This module adds a
continuous-batching front: requests queue up, a collector groups
compatible ones (same modality kind + sampling params) inside a small
window, pads the batch to a fixed size tier so the engine compiles a
bounded set of programs, and streams each sample's tokens back to its own
request as chunks arrive.

TPU-shaped choices:
  * batch tiers {1, 2, 4, 8}: the engine jit-caches per (bucket, B, mode);
    padding to tiers bounds compile count. Pad slots are short text-only
    prompts — in grouped-vision mode they reference media group 0, so NO
    extra encode work is added by padding.
  * grouped media: G distinct videos encode once each and feed B >= G
    prompts via the engine's vision_grouped mode (media_group indices) —
    concurrent questions about the same video share its encode.
  * per-request streaming: the engine's stream_cb fans out to per-request
    queues; each request caps its own max_new_tokens at emission.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

BATCH_TIERS = (1, 2, 4, 8)


@dataclass
class _Request:
    instruct: object                  # str | message list
    modal: str                        # 'video' | 'image' | 'text'
    tensor: Optional[np.ndarray]      # [T, H, W, 3] or None
    do_sample: bool
    temperature: float
    top_p: float
    max_new_tokens: int
    out: "queue.Queue" = field(default_factory=queue.Queue)

    @property
    def group_key(self):
        # text rides with video batches (zero-cost pad-like slots); images
        # need image_mode so they batch separately
        kind = "image" if self.modal == "image" else "vision"
        return (kind, self.do_sample, round(self.temperature, 3),
                round(self.top_p, 3))


class DynamicBatcher:
    """Collects concurrent generate requests into batched engine calls."""

    def __init__(self, model, tokenizer, max_batch: int = 8,
                 window_ms: float = 30.0, inflight: int = 2):
        self.model = model
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self._pending: list[_Request] = []
        self._cv = threading.Condition()
        self._stats = {"batches": 0, "requests": 0, "max_group": 0}
        # `inflight` collector threads: with one, group N+1's host prep and
        # prefill dispatch wait for group N's full generate, leaving the
        # device idle between groups — the un-batched worker's 5 concurrent
        # generates pipeline through the device queue and win at small
        # model scales (BASELINE.md serving row). Two in-flight groups
        # restore that pipelining while keeping the batched decode.
        self._threads = [threading.Thread(target=self._loop, daemon=True)
                         for _ in range(max(1, inflight))]
        for t in self._threads:
            t.start()

    # -- client side -------------------------------------------------------

    def submit(self, instruct, modal: str, tensor, *, do_sample=False,
               temperature=0.2, top_p=0.9, max_new_tokens=256,
               **_unsupported) -> "queue.Queue":
        """Enqueue a request; returns a queue of ("chunk"|"done"|"error",
        text) events. Extra generation kwargs (e.g. speculative_k, which
        only applies to batch-1 greedy decoding) are accepted and
        ignored — the worker forwards one kwargs dict to either path."""
        req = _Request(instruct=instruct, modal=modal, tensor=tensor,
                       do_sample=bool(do_sample),
                       temperature=float(temperature), top_p=float(top_p),
                       max_new_tokens=int(max_new_tokens))
        with self._cv:
            self._pending.append(req)
            self._stats["requests"] += 1
            self._cv.notify()
        return req.out

    @property
    def stats(self):
        return dict(self._stats)

    # -- collector ---------------------------------------------------------

    def _take_group(self) -> list:
        """Wait for work, then gather same-key requests within the window."""
        with self._cv:
            while not self._pending:
                self._cv.wait()
            deadline = time.monotonic() + self.window_s
            key = self._pending[0].group_key
            while True:
                n = sum(1 for r in self._pending if r.group_key == key)
                if n >= self.max_batch:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
            group, rest = [], []
            for r in self._pending:
                if r.group_key == key and len(group) < self.max_batch:
                    group.append(r)
                else:
                    rest.append(r)
            self._pending = rest
            return group

    def _loop(self):
        while True:
            group = self._take_group()
            try:
                self._run_group(group)
            except Exception as e:  # noqa: BLE001 - fail the whole group
                for r in group:
                    r.out.put(("error", f"{type(e).__name__}: {e}"))

    # -- batched generation ------------------------------------------------

    def _run_group(self, group: list):
        from ..inference.api import build_prompt_ids
        from ..inference.engine import GenerationConfig

        cfg = self.model.config
        engine = self.model.engine
        kind = group[0].group_key[0]
        with self._cv:  # multiple collector threads share the counters
            self._stats["batches"] += 1
            self._stats["max_group"] = max(self._stats["max_group"],
                                           len(group))

        # pad the batch up to the next tier with text-only dummies (no
        # media -> no extra encode; their decode rows are masked by eos)
        B = next((t for t in BATCH_TIERS if t >= len(group)),
                 self.max_batch)
        n_real = len(group)
        n_pad = B - n_real

        batch_ids = [build_prompt_ids(r.instruct, cfg, self.tokenizer,
                                      r.modal) for r in group]
        if n_pad:
            pad_ids = build_prompt_ids("ok", cfg, self.tokenizer, "text")
            batch_ids += [pad_ids] * n_pad

        frames = None
        media_group = None
        image_mode = False
        if kind == "image":
            # engine image mode reads frames[:, :1] — one frame per sample
            image_mode = True
            rows = []
            for r in group:
                arr = np.asarray(r.tensor)
                if arr.shape[-1] != 3:
                    # planar I420 wire (media/wire.py): [T, H*3/2, W]
                    rows.append(arr[:1])
                else:
                    rows.append(arr[:1] if arr.ndim == 4 else arr[None])
            rows += [np.zeros_like(rows[0])] * n_pad
            frames = np.stack(rows)           # [B, 1, H, W, 3] | [B, 1, R, W]
        else:
            # grouped vision: G distinct media, every sample points at a
            # group (text samples at 0 — their splice plan has no visual
            # slots, so the index is inert)
            media, idx = [], []
            for r in group:
                if r.tensor is not None:
                    idx.append(len(media))
                    media.append(np.asarray(r.tensor))
                else:
                    idx.append(0)
            idx += [0] * n_pad
            if media:
                frames = np.stack(media)
                media_group = idx

        gen = GenerationConfig(
            do_sample=group[0].do_sample, temperature=group[0].temperature,
            top_p=group[0].top_p,
            max_new_tokens=max(r.max_new_tokens for r in group))

        emitted_len = [0] * n_real

        def stream_cb(b, ids):
            if b >= n_real:
                return
            r = group[b]
            ids = ids[:r.max_new_tokens]
            if len(ids) > emitted_len[b]:
                emitted_len[b] = len(ids)
                text = self.tokenizer.decode(ids, skip_special_tokens=True)
                r.out.put(("chunk", text))

        if frames is None:
            outs = engine.generate(batch_ids, gen=gen,
                                   eos_token_id=self.tokenizer.eos_token_id,
                                   stream_cb=stream_cb)
        else:
            outs = engine.generate(batch_ids, frames=frames, gen=gen,
                                   eos_token_id=self.tokenizer.eos_token_id,
                                   media_group=media_group,
                                   image_mode=image_mode,
                                   stream_cb=stream_cb)
        for b, r in enumerate(group):
            ids = outs[b][:r.max_new_tokens]
            text = self.tokenizer.decode(ids, skip_special_tokens=True)
            r.out.put(("done", text.strip()))
