"""Generation engine: jitted multimodal prefill + chunked on-device decode.

Replaces the HF GenerationMixin python loop the reference relies on
(videollama2/model/videollama2_mistral.py:110-144 -> HF generate). TPU-native
design:

  * prompts are padded to a small set of static BUCKETS so each bucket
    compiles once; the KV cache is preallocated at `max_len`;
  * decoding runs as a `lax.scan` of DECODE_CHUNK steps per device call with
    the cache DONATED (no reallocation, no host round-trip per token) —
    between chunks the host checks EOS/keyword stopping and streams text,
    preserving KeywordsStoppingCriteria behavior (mm_utils.py:314-345)
    without a per-token device sync;
  * once every sequence has finished inside a chunk, the remaining scan steps
    still execute but their writes are masked — wasted work is bounded by
    DECODE_CHUNK-1 tokens per sequence.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..models import llm as llm_lib
from ..models import videollama2 as vl2
from ..multimodal import splice as splice_lib
from . import sampling

DEFAULT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
DECODE_CHUNK = 32


def _prepare_single_chip(params, dtype, fuse: bool, target) -> dict:
    """Engine param prep in a BOUNDED number of device dispatches.

    Three jobs, each batched into (at most) one dispatch:

      1. dtype casts: every floating leaf whose dtype != `dtype` (fp32
         quantization scales, checkpoint-loaded fp32 weights) is cast by ONE
         jitted program over the list of such leaves;
      2. pinning: leaves not already resident on `target` are committed by
         ONE tree-level jax.device_put — host-committed params would be
         re-transferred on every jit call (catastrophic over a remote-tunnel
         TPU). Leaves already resident (jit outputs, the on-device
         synthetic-fill path) are left alone and UNCOMMITTED; the
         jax.default_device migration hazard that creates is guarded at the
         call sites (_guard_default_device) because committing them would
         cost a per-leaf RPC round trip each;
      3. q/k/v fusion (ops/quant.fuse_qkv): one jitted concat program.

    The previous per-leaf version of this prep (~50 eager scale casts +
    concats, one RPC round trip each on tunnel backends) was measured
    costing 1.1-128 s of engine build for identical work depending on
    tunnel load; batched it is one dispatch's latency.
    """
    flat, treedef = jax.tree.flatten(params)
    flat = [a if hasattr(a, "dtype") else np.asarray(a) for a in flat]

    cast_idx = [i for i, a in enumerate(flat)
                if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dtype]
    if cast_idx:
        cast = jax.jit(lambda xs: [x.astype(dtype) for x in xs])
        for i, out in zip(cast_idx, cast([flat[i] for i in cast_idx])):
            flat[i] = out

    def _resident(a):
        try:
            return a.devices() == {target}
        except AttributeError:
            return False
    host_idx = [i for i, a in enumerate(flat) if not _resident(a)]
    if host_idx:
        for i, out in zip(host_idx,
                          jax.device_put([flat[i] for i in host_idx],
                                         target)):
            flat[i] = out

    tree = jax.tree.unflatten(treedef, flat)
    if fuse and "llm" in tree:
        # single-chip quantized serving: fuse the q/k/v packs so decode
        # issues one layer-indexed kernel per attention projection set
        # (no-op on unquantized or LoRA-carrying params); skipped when
        # sharded — TP rules address q/k/v separately
        from ..ops import quant as quant_lib
        tree = dict(tree, llm=quant_lib.fuse_qkv(tree["llm"]))
    return tree


@dataclass
class GenerationConfig:
    """Defaults parity: videollama2/__init__.py:93-96.

    speculative_k >= 2 enables self-speculative decoding (prompt-lookup
    drafts verified K tokens per device pass — inference/speculative.py)
    for greedy batch-1 requests; other requests ignore it. Output tokens
    are identical to plain greedy decoding.
    """
    do_sample: bool = False
    temperature: float = 0.2
    top_p: float = 0.9
    max_new_tokens: int = 2048
    seed: int = 0
    speculative_k: int = 0


@dataclass
class Session:
    """Prefix-cached generation state for multi-turn chat (batch-1).

    Holds the live KV cache after a generate() so follow-up turns feed ONLY
    their new tokens through K-token verify passes (models/llm.decode_verify)
    instead of re-encoding media and re-prefilling the whole history — the
    reference re-runs its full HF prefill every turn. Logical RoPE positions
    continue across turns (valid_len + steps_done), so a continued
    generation is token-identical to a fresh full-prompt generation
    (tests/test_session.py).
    """
    cache: Any
    bucket: int
    steps_done: int          # tokens embedded at cache rows [bucket, ...)
    valid_len: np.ndarray    # [1] spliced prompt length of turn 1
    last_token: int          # newest emitted token (KV not yet written)
    token_history: list      # prompt ids (incl. modal tags) + all later ids


class Engine:
    """Compiled generation over a fixed ModelConfig + params."""

    def __init__(self, cfg: ModelConfig, params: dict,
                 dtype=jnp.bfloat16, max_len: int = 4096,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 attn_impl: str = "auto", decode_chunk: int = DECODE_CHUNK,
                 shard_fn: Optional[Callable] = None,
                 w8a8_prefill: bool = True,
                 fuse_qkv: bool = True,
                 kv_bits: int = 16):
        if cfg.llm.is_moe and cfg.llm.moe_dispatch == "auto":
            # Inference defaults to exact dense dispatch: the capacity-based
            # gather drops over-capacity tokens under router imbalance (a
            # documented delta vs HF MixtralSparseMoeBlock, reference
            # train.py:34), and every real Mixtral prefill exceeds the auto
            # threshold. Answer parity beats the k/E FLOP saving here;
            # training keeps the gather via moe_dispatch="auto"/"gather".
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, moe_dispatch="dense"))
        self.cfg = cfg
        self.dtype = dtype
        if kv_bits not in (8, 16):
            raise ValueError(f"kv_bits must be 8 or 16, got {kv_bits}")
        self.kv_bits = kv_bits
        if kv_bits == 8:
            # int8 KV cache: halves the decode-attention HBM reads and the
            # cache footprint (the B=16 / M=4k headroom lever). Cache rows
            # quantize per (row, kv-head) with models/llm._quantize_kv_rows
            # everywhere (prefill, decode, verify), so speculative/session
            # decoding stays token-identical to the plain quantized loop.
            # max_len rounds up to a multiple of 256 so the Pallas decode
            # kernel's lane-layout scale blocks always have a 128-aligned
            # pipelined block size (ops/decode_attention block rule).
            max_len = -(-max_len // 256) * 256
        self.max_len = max_len
        self.buckets = tuple(b for b in buckets if b <= max_len)
        self.attn_impl = attn_impl
        self.decode_chunk = decode_chunk
        # int8-pack models only: prefill via native s8xs8 MXU dots
        # (ops/layers.w8a8_prefill); no-op for bf16 params
        self.w8a8_prefill = w8a8_prefill
        target = jax.devices()[0]

        if shard_fn is not None:
            def _cast(a):
                a = jnp.asarray(a)
                if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dtype:
                    a = a.astype(dtype)
                return a
            self.params = shard_fn(jax.tree.map(_cast, params))
        else:
            # single-chip: dtype casts + q/k/v fusion run as a BOUNDED
            # number of dispatches (<=3), not one per leaf — on tunnel
            # backends every dispatch is an RPC round trip, and the
            # per-leaf version of this prep was measured costing 55-128 s
            # of engine build under congestion (1.1 s quiet) for the same
            # ~50 scale casts + concats (BASELINE.md round-5 notes)
            self.params = _prepare_single_chip(
                params, dtype, fuse=fuse_qkv, target=target)
        self._target_device = target
        self._prefill_cache = {}
        self._verify_cache = {}
        self._decode_cache = {}
        self._encode_fn = None

    def _guard_default_device(self):
        """Engine params include UNCOMMITTED device-resident leaves (the
        zero-copy build path); those follow jax.default_device at jit
        boundaries, so running generate() inside a `with
        jax.default_device(other)` context would silently migrate the whole
        param tree off the accelerator — a catastrophic re-transfer over a
        tunnel backend. Fail loudly instead."""
        dd = jax.config.jax_default_device
        if isinstance(dd, str):
            # jax.default_device also accepts a platform string; it
            # resolves to that platform's first device at placement time.
            try:
                dd = jax.devices(dd)[0]
            except RuntimeError:
                dd = None  # unknown platform: placement would fail first
        if dd is not None and dd != self._target_device:
            raise RuntimeError(
                f"Engine methods must not run under jax.default_device("
                f"{dd}): engine params are pinned to {self._target_device} "
                "and uncommitted leaves would migrate. Exit the "
                "default_device context before calling generate().")

    # -- compiled pieces ---------------------------------------------------

    def _get_prefill(self, seq_len: int, batch: int, mode: str):
        """mode: 'text' | 'vision' | 'audio' | 'av'."""
        key = (seq_len, batch, mode)
        if key not in self._prefill_cache:
            cfg, attn_impl = self.cfg, self.attn_impl
            from ..ops import layers as layers_ops
            w8a8 = self.w8a8_prefill

            def jit_p(donate):
                # the w8a8/quant-inference contexts must be active while
                # jit TRACES the body, so they wrap inside the jitted fn
                def deco(fn):
                    def inner(*args):
                        with layers_ops.quant_inference(True), \
                                layers_ops.w8a8_prefill(w8a8):
                            return fn(*args)
                    return jax.jit(inner, donate_argnums=donate)
                return deco

            @jit_p((6,))
            def prefill_vision(params, frames, text_ids, is_visual,
                               vis_index, valid_len, cache):
                positions = jnp.broadcast_to(
                    jnp.arange(text_ids.shape[1]), text_ids.shape)
                if mode == "vision_shared":
                    # one video, B prompts: encode once, broadcast tokens
                    vis = vl2.encode_frames(params, cfg, frames,
                                            attn_impl=attn_impl)
                    vis = jnp.broadcast_to(
                        vis, (text_ids.shape[0],) + vis.shape[1:])
                    from ..multimodal import splice as splice_lib
                    text_emb = llm_lib.embed_tokens(
                        params["llm"], text_ids, dtype=self.dtype)
                    embeds = splice_lib.compose_embeds(
                        text_emb, vis, is_visual, vis_index)
                    last, cache = llm_lib.prefill(
                        params["llm"], cfg.llm, embeds, positions,
                        valid_len, cache, attn_impl=attn_impl)
                elif mode == "vision_grouped":
                    # frames [G, T, ...] + per-sample group index: G distinct
                    # videos encode once each and feed B >= G prompts
                    frames_arr, group_idx = frames
                    vis = vl2.encode_frames(params, cfg, frames_arr,
                                            attn_impl=attn_impl)
                    vis = jnp.take(vis, group_idx, axis=0)   # [B, N, D]
                    from ..multimodal import splice as splice_lib
                    text_emb = llm_lib.embed_tokens(
                        params["llm"], text_ids, dtype=self.dtype)
                    embeds = splice_lib.compose_embeds(
                        text_emb, vis, is_visual, vis_index)
                    last, cache = llm_lib.prefill(
                        params["llm"], cfg.llm, embeds, positions,
                        valid_len, cache, attn_impl=attn_impl)
                else:
                    last, cache = vl2.prefill_multimodal(
                        params, cfg, frames, text_ids, is_visual, vis_index,
                        positions, valid_len, cache, attn_impl=attn_impl,
                        broadcast_image=(mode == "image"))
                logits = llm_lib.lm_logits(params["llm"], cfg.llm, last)
                return logits, cache

            @jit_p((6,))
            def prefill_audio(params, fbank, text_ids, is_visual,
                              vis_index, valid_len, cache):
                aud = vl2.encode_audio(params, cfg, fbank)
                from ..multimodal import splice as splice_lib
                text_emb = llm_lib.embed_tokens(
                    params["llm"], text_ids, dtype=self.dtype)
                embeds = splice_lib.compose_embeds(
                    text_emb, aud, is_visual, vis_index)
                positions = jnp.broadcast_to(
                    jnp.arange(text_ids.shape[1]), text_ids.shape)
                last, cache = llm_lib.prefill(
                    params["llm"], cfg.llm, embeds, positions, valid_len,
                    cache, attn_impl=attn_impl)
                logits = llm_lib.lm_logits(params["llm"], cfg.llm, last)
                return logits, cache

            @jit_p((7,))
            def prefill_av(params, frames, fbank, text_ids, is_visual,
                           vis_index, valid_len, cache):
                vis = vl2.encode_frames(params, cfg, frames,
                                        attn_impl=attn_impl)
                aud = vl2.encode_audio(params, cfg, fbank)
                from ..multimodal import splice as splice_lib
                # per-sample stack: video tokens then audio tokens (the AV
                # template places <video> before <audio>)
                tokens = jnp.concatenate([vis, aud], axis=1)
                text_emb = llm_lib.embed_tokens(
                    params["llm"], text_ids, dtype=self.dtype)
                embeds = splice_lib.compose_embeds(
                    text_emb, tokens, is_visual, vis_index)
                positions = jnp.broadcast_to(
                    jnp.arange(text_ids.shape[1]), text_ids.shape)
                last, cache = llm_lib.prefill(
                    params["llm"], cfg.llm, embeds, positions, valid_len,
                    cache, attn_impl=attn_impl)
                logits = llm_lib.lm_logits(params["llm"], cfg.llm, last)
                return logits, cache

            @jit_p((3,))
            def prefill_text(params, text_ids, valid_len, cache):
                embeds = llm_lib.embed_tokens(params["llm"], text_ids,
                                              dtype=self.dtype)
                positions = jnp.broadcast_to(
                    jnp.arange(text_ids.shape[1]), text_ids.shape)
                last, cache = llm_lib.prefill(
                    params["llm"], cfg.llm, embeds, positions, valid_len,
                    cache, attn_impl=attn_impl)
                logits = llm_lib.lm_logits(params["llm"], cfg.llm, last)
                return logits, cache

            self._prefill_cache[key] = {
                "vision": prefill_vision, "image": prefill_vision,
                "vision_shared": prefill_vision,
                "vision_grouped": prefill_vision, "audio": prefill_audio,
                "av": prefill_av, "text": prefill_text}[mode]
        return self._prefill_cache[key]

    def _get_decode(self, do_sample: bool, temperature: float, top_p: float,
                    bucket: int):
        # cached like _get_prefill/_get_verify: a fresh jax.jit wrapper per
        # call would re-trace AND re-stage the decode executable on every
        # generate() — measured ~1.3-1.7 s per iteration on the 7B bench
        # (66 ms/tok in-bench vs 14.1 for the cached program)
        key = (do_sample, temperature, top_p, bucket)
        if key in self._decode_cache:
            return self._decode_cache[key]
        cfg = self.cfg
        chunk = self.decode_chunk

        from ..ops import layers as layers_ops

        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnames=("num_steps",))
        def decode_chunk_fn(params, tokens, cache, valid_len, step0, done,
                            rng, eos_id, num_steps=chunk):
            """tokens: [B] last sampled ids; step0: scalar decode index of
            the first step in this chunk. Returns emitted [B, chunk]."""

            def step_fn(carry, _):
                tokens, cache, step, done, rng = carry
                te = llm_lib.embed_tokens(params["llm"], tokens[:, None],
                                          dtype=self.dtype)
                logits, cache = llm_lib.decode_step(
                    params["llm"], cfg.llm, te, cache, valid_len, bucket,
                    step)
                rng, sub = jax.random.split(rng)
                nxt = sampling.select_token(sub, logits, do_sample,
                                            temperature, top_p)
                nxt = jnp.where(done, eos_id, nxt).astype(jnp.int32)
                new_done = done | (nxt == eos_id)
                return (nxt, cache, step + 1, new_done, rng), nxt

            with layers_ops.quant_inference(True):
                (tokens, cache, _, done, rng), out = jax.lax.scan(
                    step_fn, (tokens, cache, step0, done, rng), None,
                    length=num_steps)
            return out.T, tokens, cache, done, rng

        self._decode_cache[key] = decode_chunk_fn
        return decode_chunk_fn

    def _get_verify(self, bucket: int, k: int):
        """Jitted K-slot verify: returns per-slot greedy ids (the [K, V]
        logits never cross the wire) plus the final slot's logits (consumed
        lazily — only session continuation fetches them, to sample the
        first token of the new turn)."""
        key = (bucket, k)
        if key not in self._verify_cache:
            cfg = self.cfg

            from ..ops import layers as layers_ops

            @functools.partial(jax.jit, donate_argnums=(2,))
            def verify_fn(params, tokens, cache, valid_len, step0):
                with layers_ops.quant_inference(True):
                    te = llm_lib.embed_tokens(params["llm"], tokens,
                                              dtype=self.dtype)
                    logits, cache = llm_lib.decode_verify(
                        params["llm"], cfg.llm, te, cache, valid_len,
                        bucket, step0)
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return greedy, logits[:, -1], cache

            self._verify_cache[key] = verify_fn
        return self._verify_cache[key]

    def _decode_speculative(self, outs, done_np, cache, valid_arr,
                            bucket, eos, gen, stop_fn, stream_cb, context,
                            step0=0):
        """Greedy batch-1 speculative decode loop (see
        inference/speculative.py). Returns (outs, cache, steps_done,
        done_np); the caller's plain chunked loop finishes any cache-budget
        tail, so output parity with plain greedy holds for every budget."""
        from . import speculative as spec
        k = gen.speculative_k
        verify = self._get_verify(bucket, k)
        budget = self.max_len - bucket
        while (not done_np[0] and len(outs[0]) < gen.max_new_tokens
               and step0 + k <= budget):
            last = outs[0][-1]
            drafts = spec.ngram_propose(context + outs[0], k - 1)
            drafts += [last] * (k - 1 - len(drafts))  # pad: rejected free
            tokens = jnp.asarray([[last] + drafts], jnp.int32)
            greedy, _, cache = verify(self.params, tokens, cache, valid_arr,
                                      jnp.int32(step0))
            emitted, accepted = spec.accept_drafts(
                drafts, [int(t) for t in np.asarray(greedy)[0]])
            # budget caps: never emit past max_new_tokens
            room = gen.max_new_tokens - len(outs[0])
            emitted = emitted[:room]
            for t in emitted:
                outs[0].append(t)
                if t == eos or (stop_fn is not None and stop_fn(outs[0])):
                    done_np[0] = True
                    break
            if stream_cb is not None:
                stream_cb(0, outs[0])
            step0 += accepted + 1
        return outs, cache, step0, done_np

    def _decode_speculative_batched(self, outs, done_np, cache, valid_arr,
                                    bucket, eos, gen, stop_fn, stream_cb,
                                    contexts, step0=0):
        """Per-row speculative decode for B > 1 (beyond-reference).

        Each row drafts from its own context and advances by its own
        acceptance count: rows write and attend at independent cache
        frontiers (models/llm.decode_verify per-row step0). Rows that are
        done (or out of room) ride along masked — their slots re-verify
        the last token and their frontier stays frozen, so verify writes
        land beyond their committed rows and are never read.

        Runs to completion (k-slot rounds while every live row fits k,
        then 1-slot rounds for the cache-budget tail) — unlike the B=1
        path there is no lockstep chunked loop to fall through to once
        frontiers diverge. Greedy output is token-identical per row to
        the plain batched loop (tests/test_speculative.py)."""
        from . import speculative as spec
        B = len(outs)
        budget = self.max_len - bucket
        steps = np.full(B, step0, np.int64)

        def live(b, room_rows):
            return (not done_np[b] and len(outs[b]) < gen.max_new_tokens
                    and steps[b] + room_rows <= budget)

        for k_round in (gen.speculative_k, 1):
            verify = self._get_verify(bucket, k_round)
            while any(live(b, k_round) for b in range(B)):
                tokens = []
                drafts_by_row = []
                for b in range(B):
                    last = outs[b][-1]
                    if live(b, k_round):
                        drafts = spec.ngram_propose(contexts[b] + outs[b],
                                                    k_round - 1)
                        drafts += [last] * (k_round - 1 - len(drafts))
                    else:
                        drafts = [last] * (k_round - 1)
                    drafts_by_row.append(drafts)
                    tokens.append([last] + drafts)
                greedy, _, cache = verify(
                    self.params, jnp.asarray(tokens, jnp.int32), cache,
                    valid_arr, jnp.asarray(steps, jnp.int32))
                greedy_np = np.asarray(greedy)
                for b in range(B):
                    if not live(b, k_round):
                        continue
                    emitted, accepted = spec.accept_drafts(
                        drafts_by_row[b],
                        [int(t) for t in greedy_np[b]])
                    room = gen.max_new_tokens - len(outs[b])
                    emitted = emitted[:room]
                    for t in emitted:
                        outs[b].append(t)
                        if t == eos or (stop_fn is not None
                                        and stop_fn(outs[b])):
                            done_np[b] = True
                            break
                    if stream_cb is not None:
                        stream_cb(b, outs[b])
                    steps[b] += accepted + 1
        return outs, cache, int(steps.max()), done_np

    def _frames_to_device(self, frames) -> jax.Array:
        """Frames to device: uint8 stays uint8 (normalized on device by
        encode_frames), floats cast to the engine dtype. jax.Arrays pass
        through untouched so callers can overlap the upload (see
        upload_frames / generate docstring)."""
        if isinstance(frames, jax.Array):
            return (frames if frames.dtype in (jnp.uint8, self.dtype)
                    else frames.astype(self.dtype))
        fr = np.asarray(frames)
        return (jnp.asarray(fr) if fr.dtype == np.uint8
                else jnp.asarray(fr, self.dtype))

    def upload_frames(self, frames: np.ndarray) -> jax.Array:
        """Start an async host->device upload of a frame batch and return
        the device array. Call this for batch i+1 right after dispatching
        batch i's generate(): the copy streams while the device computes,
        hiding the transfer (~1 s for 43 MB over a remote tunnel)."""
        return self._frames_to_device(frames)

    # -- public API --------------------------------------------------------

    def pick_bucket(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        if length <= self.max_len:
            return self.max_len
        raise ValueError(f"prompt length {length} > max_len {self.max_len}")

    def generate(self, batch_input_ids: List[Sequence[int]],
                 frames: Optional[np.ndarray] = None,
                 audio: Optional[np.ndarray] = None,
                 gen: GenerationConfig = GenerationConfig(),
                 eos_token_id: Optional[int] = None,
                 stop_fn: Optional[Callable[[List[int]], bool]] = None,
                 stream_cb: Optional[Callable[[int, List[int]], None]] = None,
                 image_mode: bool = False,
                 share_media: bool = False,
                 media_group: Optional[Sequence[int]] = None,
                 return_session: bool = False,
                 ):
        """Generate continuations for a batch of tokenized prompts.

        batch_input_ids may contain negative modal tokens; frames is
        [B, T, H, W, 3] float32 or uint8, one slot per sample (zeros rows
        for text-only samples in a mixed batch), or None. frames may also
        be a jax.Array already resident on device — callers that know the
        next batch ahead of time can jax.device_put it while the previous
        batch computes, hiding the host->device transfer entirely (the
        upload streams behind the dispatched computation). audio is
        [B, audio.max_frames, 128] normalized fbank features or None. For
        joint AV prompts the <video>/<image> tag must precede <audio>.
        Returns newly generated ids per sample (EOS included, parity with
        HF generate output minus the prompt); with return_session=True
        (batch-1 only) returns (ids, Session) for prefix-cached follow-up
        turns via generate_continue.
        """
        from ..constants import AUDIO_TOKEN_INDEX
        self._guard_default_device()
        cfg = self.cfg
        if return_session and len(batch_input_ids) != 1:
            raise ValueError("sessions are batch-1 (multi-turn chat)")
        eos = eos_token_id if eos_token_id is not None else cfg.llm.eos_token_id
        B = len(batch_input_ids)
        mode = ("av" if frames is not None and audio is not None else
                ("image" if image_mode else
                 "vision_shared" if share_media else
                 "vision_grouped" if media_group is not None else "vision")
                if frames is not None else
                "audio" if audio is not None else "text")
        if mode == "vision_shared":
            # frames: [1, T, H, W, 3] shared by every prompt in the batch
            frames = frames[:1]
        if mode == "image":
            # single-frame slot: the tower runs once, features broadcast to
            # num_frames on device (see encode_frames broadcast_image)
            frames = frames[:, :1]
        tokens_per_modal: Any = cfg.tokens_per_video
        if audio is not None:
            tokens_per_modal = {-200: cfg.tokens_per_video,
                                -201: cfg.tokens_per_video,
                                AUDIO_TOKEN_INDEX: cfg.tokens_per_audio}
            if mode == "audio":
                tokens_per_modal[-200] = tokens_per_modal[-201] = 0

        lengths = [splice_lib.spliced_length(ids, tokens_per_modal)
                   for ids in batch_input_ids]
        bucket = self.pick_bucket(max(lengths))
        plan = splice_lib.plan_batch(batch_input_ids, tokens_per_modal,
                                     bucket)

        cache = llm_lib.init_cache(cfg.llm, B, self.max_len, self.dtype,
                                   kv_bits=self.kv_bits)
        prefill = self._get_prefill(bucket, B, mode)
        plan_args = (jnp.asarray(plan.text_ids), jnp.asarray(plan.is_visual),
                     jnp.asarray(plan.vis_index),
                     jnp.asarray(plan.valid_len))
        if mode in ("vision", "image", "vision_shared", "vision_grouped"):
            fr = self._frames_to_device(frames)
            if mode == "vision_grouped":
                fr = (fr, jnp.asarray(np.asarray(media_group,
                                                 dtype=np.int32)))
            logits, cache = prefill(self.params, fr, *plan_args, cache)
        elif mode == "audio":
            logits, cache = prefill(self.params,
                                    jnp.asarray(audio, self.dtype),
                                    *plan_args, cache)
        elif mode == "av":
            fr = self._frames_to_device(frames)
            logits, cache = prefill(self.params, fr,
                                    jnp.asarray(audio, self.dtype),
                                    *plan_args, cache)
        else:
            logits, cache = prefill(self.params, plan_args[0], plan_args[3],
                                    cache)

        rng = jax.random.PRNGKey(gen.seed)
        rng, sub = jax.random.split(rng)
        first = sampling.select_token(sub, logits, gen.do_sample,
                                      gen.temperature, gen.top_p)
        first = first.astype(jnp.int32)
        outs: List[List[int]] = [[int(t)] for t in np.asarray(first)]
        done_np = np.array([o[-1] == eos for o in outs])
        if stream_cb is not None:
            for b in range(B):
                stream_cb(b, outs[b])

        valid_arr = jnp.asarray(plan.valid_len)
        contexts = [[t for t in ids if t >= 0] for ids in batch_input_ids]
        outs, cache, steps_done = self._decode_tail(
            outs, done_np, cache, valid_arr, bucket, 0, first, rng, eos,
            gen, stop_fn, stream_cb, contexts)
        if return_session:
            # steps_done from the LOOP over-counts when EOS landed inside a
            # chunk / speculative round (the remaining masked steps embed
            # forced-EOS or draft tokens at later rows). The session's
            # frontier is the last row belonging to the SEQUENCE: token i of
            # outs was embedded at row bucket+i, and outs[-1] is not yet
            # embedded — so exactly len(outs)-1 rows are committed. Rows
            # beyond hold orphans that the continuation overwrites before
            # its mask frontier ever reaches them.
            session = Session(
                cache=cache, bucket=bucket, steps_done=len(outs[0]) - 1,
                valid_len=np.asarray(plan.valid_len).copy(),
                last_token=outs[0][-1],
                token_history=list(batch_input_ids[0]) + list(outs[0]))
            return outs, session
        return outs

    def _decode_tail(self, outs, done_np, cache, valid_arr, bucket,
                     steps_done, tokens, rng, eos, gen, stop_fn, stream_cb,
                     contexts):
        """Shared decode loop after a first token exists: speculative loop
        (when eligible) then chunked scan decode for the remainder.
        `contexts`: per-row prompt token lists (draft source).
        Returns (outs, cache, steps_done)."""
        B = len(outs)
        if gen.speculative_k >= 2 and B > 1 and not gen.do_sample:
            # per-row frontiers after batched speculation are incompatible
            # with the lockstep chunk loop below, so the batched variant
            # runs to completion and returns directly
            return self._decode_speculative_batched(
                outs, done_np, cache, valid_arr, bucket, eos, gen,
                stop_fn, stream_cb, contexts, steps_done)[:3]
        if gen.speculative_k >= 2 and B == 1 and not gen.do_sample:
            # prompt-lookup speculative decode (greedy; output tokens
            # identical to the plain loop below). Any cache-budget
            # tail (< k rows left) falls through to the plain loop.
            outs, cache, steps_done, done_np = self._decode_speculative(
                outs, done_np, cache, valid_arr, bucket, eos, gen,
                stop_fn, stream_cb, contexts[0], steps_done)
            tokens = jnp.asarray([outs[0][-1]], jnp.int32)
        done = jnp.asarray(done_np)
        decode = self._get_decode(gen.do_sample, gen.temperature, gen.top_p,
                                  bucket)
        # generated tokens occupy cache rows [bucket, max_len)
        budget = self.max_len - bucket
        remaining = min(gen.max_new_tokens - len(outs[0]),
                        budget - steps_done)
        while remaining > 0 and not done_np.all():
            steps = min(self.decode_chunk, remaining)
            emitted, tokens, cache, done, rng = decode(
                self.params, tokens, cache, valid_arr,
                jnp.int32(steps_done), done, rng, jnp.int32(eos),
                num_steps=steps)
            emitted = np.asarray(emitted)  # [B, steps]
            for b in range(B):
                if done_np[b]:
                    continue
                for t in emitted[b]:
                    outs[b].append(int(t))
                    if int(t) == eos:
                        done_np[b] = True
                        break
                    if stop_fn is not None and stop_fn(outs[b]):
                        done_np[b] = True
                        break
                if stream_cb is not None:
                    stream_cb(b, outs[b])
            remaining -= steps
            steps_done += steps
            done = jnp.asarray(done_np) | done
        return outs, cache, steps_done

    def generate_continue(self, session: Session,
                          new_ids: Sequence[int],
                          gen: GenerationConfig = GenerationConfig(),
                          eos_token_id: Optional[int] = None,
                          stop_fn: Optional[Callable] = None,
                          stream_cb: Optional[Callable] = None):
        """Continue a Session with a new text-only turn (prefix caching).

        Feeds [last_token] + new_ids through K-slot verify chunks — the
        media stays encoded and the history stays prefilled in the
        session's cache — then decodes as usual. Output tokens are
        identical to a fresh generate() over the concatenated history
        (tests/test_session.py). Raises ValueError when the new turn +
        requested tokens cannot fit the session cache; callers fall back
        to a fresh full-prompt generate.

        Returns (new token ids, updated Session).
        """
        self._guard_default_device()
        cfg = self.cfg
        eos = (eos_token_id if eos_token_id is not None
               else cfg.llm.eos_token_id)
        assert all(t >= 0 for t in new_ids), \
            "continuation turns are text-only; re-send media via generate()"
        feed = [session.last_token] + [int(t) for t in new_ids]
        if session.bucket + session.steps_done + len(feed) + 1 > self.max_len:
            raise ValueError("session cache exhausted: "
                             f"{session.steps_done + len(feed)} generated+fed"
                             f" tokens > budget {self.max_len - session.bucket}")
        valid_arr = jnp.asarray(session.valid_len)
        cache = session.cache
        steps_done = session.steps_done
        last_logits = None
        pos = 0
        # static chunk sizes so at most 3 verify programs compile
        while pos < len(feed):
            size = next(c for c in (32, 8, 1) if c <= len(feed) - pos)
            verify = self._get_verify(session.bucket, size)
            chunk = jnp.asarray([feed[pos:pos + size]], jnp.int32)
            _, last_logits, cache = verify(self.params, chunk, cache,
                                           valid_arr, jnp.int32(steps_done))
            steps_done += size
            pos += size

        rng = jax.random.PRNGKey(gen.seed)
        rng, sub = jax.random.split(rng)
        first = sampling.select_token(sub, last_logits, gen.do_sample,
                                      gen.temperature, gen.top_p)
        first = first.astype(jnp.int32)
        outs = [[int(first[0])]]
        done_np = np.array([outs[0][0] == eos])
        if stream_cb is not None:
            stream_cb(0, outs[0])
        history = session.token_history + list(new_ids)
        context = [t for t in history if t >= 0]
        feed_end = steps_done            # rows committed after the feed
        outs, cache, steps_done = self._decode_tail(
            outs, done_np, cache, valid_arr, session.bucket, steps_done,
            first, rng, eos, gen, stop_fn, stream_cb, [context])
        # same over-count correction as generate(): only len(outs)-1 decode
        # rows after the feed belong to the sequence
        new_session = Session(
            cache=cache, bucket=session.bucket,
            steps_done=feed_end + len(outs[0]) - 1,
            valid_len=session.valid_len, last_token=outs[0][-1],
            token_history=history + list(outs[0]))
        return outs, new_session
