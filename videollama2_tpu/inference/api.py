"""Public inference API: model_init / mm_infer.

Parity: reference videollama2/__init__.py:14-114 — same call signatures,
prompt construction (including the hard-coded Llama2-style <<SYS>> system
prompt for mistral/mixtral model types), modal-token tokenization, generation
defaults, and decode. The backend is the jitted TPU Engine instead of HF
generate.
"""

from __future__ import annotations

import copy
import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..constants import (DEFAULT_IMAGE_TOKEN, DEFAULT_VIDEO_TOKEN,
                         NUM_FRAMES)
from ..core.config import ModelConfig
from ..checkpoint import convert_hf
from ..media.preprocess import process_image, process_video
from ..multimodal.tokenizer import (get_model_name_from_path,
                                    tokenizer_multimodal_token)
from .engine import Engine, GenerationConfig

MISTRAL_SYSTEM = (
    """<<SYS>>\nYou are a helpful, respectful and honest assistant. Always answer as helpfully as possible, while being safe.  Your answers should not include any harmful, unethical, racist, sexist, toxic, dangerous, or illegal content. Please ensure that your responses are socially unbiased and positive in nature."""
    """\n"""
    """If a question does not make any sense, or is not factually coherent, explain why instead of answering something not correct. If you don't know the answer to a question, please don't share false information.\n<</SYS>>""")


@dataclass
class VideoLLaMA2:
    """Loaded model handle (stands in for the HF nn.Module the reference
    returns from model_init)."""
    config: ModelConfig
    engine: Engine

    @property
    def model_type(self) -> str:
        return self.config.model_type


def _apply_wire(processor: dict, wire: str, cfg=None) -> dict:
    """Opt-in I420 wire for the processor closures (media/wire.py): their
    uint8 RGB output packs to planar YUV 4:2:0 — half the host->device
    bytes per request; the engine unpacks on device (encode_frames).
    Container-path video requests take the fully native route
    (media/csrc scale/crop in YUV, no host RGB — process_video_i420).
    Default "rgb" keeps the reference-shaped [T, H, W, 3] contract."""
    if wire == "rgb":
        return processor
    if wire != "i420":
        raise ValueError(f"wire must be 'rgb' or 'i420', got {wire!r}")
    from ..media import wire as wire_lib
    from ..media.preprocess import process_video_i420

    def wrap(fn):
        def packed(*a, **k):
            out = fn(*a, **k)
            if isinstance(out, dict):  # av: {"video": ..., "audio": ...}
                return dict(out, video=wire_lib.rgb_to_i420(out["video"]))
            return wire_lib.rgb_to_i420(out)
        return packed

    def wrap_video(fn):
        nf = (cfg.num_frames or NUM_FRAMES) if cfg is not None else None

        def packed(video_path, *a, **k):
            if (cfg is not None and isinstance(video_path, str)
                    and not a and set(k) <= {"s", "e", "num_frames"}):
                return process_video_i420(
                    video_path, cfg.vision, s=k.get("s"), e=k.get("e"),
                    num_frames=k.get("num_frames", nf))
            return wire_lib.rgb_to_i420(fn(video_path, *a, **k))
        return packed

    out = dict(processor)
    for key in ("image", "av"):
        if key in out:
            out[key] = wrap(out[key])
    if "video" in out:
        out["video"] = wrap_video(out["video"])
    return out


def model_init(model_path: Optional[str] = None, dtype=None,
               max_len: int = 4096, model_base: Optional[str] = None,
               vision_tower_path: Optional[str] = None,
               load_8bit: bool = False, load_4bit: bool = False,
               wire: str = "rgb", **kwargs):
    """Load a checkpoint directory; returns (model, processor, tokenizer).

    Parity: videollama2/__init__.py:14-29 + load_pretrained_model's LoRA /
    pretrain-adapter / full paths (model/__init__.py:48-193) via model_base.
    load_8bit/load_4bit quantize the LLM weights on load (the reference's
    bitsandbytes serving configs, model/__init__.py:59-69); the decode path
    then runs the layer-indexed int8/int4 Pallas kernels and prefill uses
    W8A8 MXU dots (int8) or dequant-in-graph (int4). wire="i420" makes the
    returned processors emit planar YUV 4:2:0 (half the host->device bytes;
    media/wire.py) — mm_infer/engine accept both formats.
    """
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.bfloat16
    if wire not in ("rgb", "i420"):  # fail before loading anything
        raise ValueError(f"wire must be 'rgb' or 'i420', got {wire!r}")
    if model_path is None:
        raise ValueError("model_path is required (no network access)")
    if model_path.startswith("synthetic://"):
        # timing-equivalent on-device fills at preset scale (no checkpoint
        # on disk, no tunnel upload): the serving benchmark's 7B config
        # (scripts/bench_serving.py --model-path 'synthetic://...'). Values
        # are constant fills — throughput numbers are real, answers are not.
        model, processor, tokenizer = _model_init_synthetic(
            model_path, dtype, max_len, **kwargs)
        return model, _apply_wire(processor, wire, model.config), tokenizer

    cfg, params = convert_hf.load_videollama2(
        model_path, model_base=model_base,
        vision_tower_path=vision_tower_path)
    if load_8bit or load_4bit:
        from ..ops import quant
        # int4 note: with the offset-binary folded-nibble pack (4 f32 VPU
        # ops/byte unpack, ops/quant.quantize_int4) int4 decode BEATS int8
        # on v5e — 11.0 vs 13.7 ms/tok at 7B/B=8 (docs/DESIGN.md) — on top
        # of the 2x weight-memory cut. The trade is accuracy, not speed.
        params["llm"] = quant.quantize_llm_params(
            params["llm"], bits=8 if load_8bit else 4)
        if load_8bit and "vision" in params:
            # bitsandbytes wraps EVERY nn.Linear — the CLIP/SigLIP tower
            # included (model/__init__.py:59-69); its GEMMs then run the
            # W8A8 MXU path inside the prefill context (~40% faster encode)
            params["vision"] = quant.quantize_vision_params(params["vision"])
    engine = Engine(cfg, params, dtype=dtype, max_len=max_len, **kwargs)
    model = VideoLLaMA2(config=cfg, engine=engine)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    if tokenizer.pad_token is None and tokenizer.unk_token is not None:
        tokenizer.pad_token = tokenizer.unk_token

    num_frames = cfg.num_frames if cfg.num_frames else NUM_FRAMES
    # production processors emit resized uint8; normalization fuses into the
    # tower's first conv on device (encode_frames) — 4x less host->HBM
    # traffic, numerically identical (preprocess.py out_dtype docs)
    processor = {
        "image": functools.partial(process_image, cfg=cfg.vision,
                                   aspect_ratio=None, out_dtype="uint8"),
        "video": functools.partial(process_video, cfg=cfg.vision,
                                   aspect_ratio=None, num_frames=num_frames,
                                   out_dtype="uint8"),
    }
    if cfg.audio is not None:
        processor["audio"] = functools.partial(_prep_audio, cfg=cfg)
        processor["av"] = functools.partial(_prep_av, cfg=cfg,
                                            num_frames=num_frames)
    return model, _apply_wire(processor, wire, cfg), tokenizer


def _model_init_synthetic(model_path: str, dtype, max_len: int, **kwargs):
    """model_path = 'synthetic://<preset>?bits=8&kv_bits=8&max_len=512
    &tokenizer=/path/to/tokenizer_dir'.

    Builds the preset-scale model with constant on-device fills
    (utils/synthetic — no host init, no tunnel upload) and a real tokenizer
    from `tokenizer` (any local tokenizer dir; ids are a subset of the
    preset vocab). Serving-throughput benchmarks at 7B scale run through
    the exact worker/batcher/engine stack this way (VERDICT r5 #4)."""
    from urllib.parse import parse_qs, urlparse
    import jax
    import jax.numpy as jnp

    from ..core import config as cfglib
    from ..models import videollama2 as vl2
    from ..utils import synthetic

    u = urlparse(model_path)
    q = {k: v[0] for k, v in parse_qs(u.query).items()}
    cfg = (cfglib.tiny_model() if u.netloc == "tiny"
           else cfglib.preset(u.netloc))
    if "num_frames" in q:
        cfg = cfg.replace(num_frames=int(q["num_frames"]))
    bits = int(q.get("bits", "8"))
    kv_bits = int(q.get("kv_bits", kwargs.pop("kv_bits", 16)))
    max_len = int(q.get("max_len", max_len))

    abstract = jax.eval_shape(lambda: vl2.init_params(
        jax.random.PRNGKey(0), cfg, dtype=dtype))
    if bits:
        # vision tower always int8 under quantized serving (bitsandbytes
        # wraps every nn.Linear; the int4 pack applies to the LLM only) —
        # same layout bench.py measures
        abstract = synthetic.quantized_abstract(
            abstract, quantize_llm=True, quantize_vision=True,
            llm_bits=bits)
    params = synthetic.materialize_fills(abstract)
    engine = Engine(cfg, params, dtype=dtype, max_len=max_len,
                    kv_bits=kv_bits, **kwargs)
    model = VideoLLaMA2(config=cfg, engine=engine)

    from transformers import AutoTokenizer
    tok_dir = q.get("tokenizer")
    if tok_dir is None:
        raise ValueError("synthetic:// model paths need "
                         "?tokenizer=<local tokenizer dir> "
                         "(e.g. from scripts/make_tiny_checkpoint.py)")
    tokenizer = AutoTokenizer.from_pretrained(tok_dir, use_fast=True)
    if tokenizer.pad_token is None and tokenizer.unk_token is not None:
        tokenizer.pad_token = tokenizer.unk_token

    num_frames = cfg.num_frames if cfg.num_frames else NUM_FRAMES
    processor = {
        "image": functools.partial(process_image, cfg=cfg.vision,
                                   aspect_ratio=None, out_dtype="uint8"),
        "video": functools.partial(process_video, cfg=cfg.vision,
                                   aspect_ratio=None, num_frames=num_frames,
                                   out_dtype="uint8"),
    }
    return model, processor, tokenizer


def build_prompt_ids(instruct, cfg, tokenizer, modal: str = "video"):
    """Chat-template + multimodal-tokenize one request -> input id list.

    Shared by mm_infer and the serving batcher (serve/batching.py); parity
    with videollama2/__init__.py:72-98 (modal tag prepend, Llama2-style
    <<SYS>> system prompt for the mistral/mixtral families).
    """
    from ..constants import DEFAULT_AUDIO_TOKEN
    if modal == "image":
        modal_token = DEFAULT_IMAGE_TOKEN
    elif modal == "video":
        modal_token = DEFAULT_VIDEO_TOKEN
    elif modal == "audio":
        modal_token = DEFAULT_AUDIO_TOKEN
    elif modal == "av":
        # joint AV: the video tag and the audio tag of the SAME clip
        # (VideoLLaMA2.1-AV, reference README.md:130-132)
        modal_token = DEFAULT_VIDEO_TOKEN + DEFAULT_AUDIO_TOKEN
    elif modal == "text":
        modal_token = ""
    else:
        raise ValueError(f"Unsupported modal: {modal}")

    if isinstance(instruct, str):
        message = [{"role": "user", "content": modal_token + "\n" + instruct}]
    elif isinstance(instruct, list):
        message = copy.deepcopy(instruct)
        message[0]["content"] = modal_token + "\n" + message[0]["content"]
    else:
        raise ValueError(f"Unsupported type of instruct: {type(instruct)}")

    if cfg.model_type in ("videollama2", "videollama2_mistral",
                          "videollama2_mixtral"):
        message = [{"role": "system", "content": MISTRAL_SYSTEM}] + message

    prompt = tokenizer.apply_chat_template(message, tokenize=False,
                                           add_generation_prompt=True)
    if modal == "av":
        from ..multimodal.tokenizer import tokenizer_multimodal_tokens
        return tokenizer_multimodal_tokens(
            prompt, tokenizer, (DEFAULT_VIDEO_TOKEN, DEFAULT_AUDIO_TOKEN))
    return tokenizer_multimodal_token(prompt, tokenizer, modal_token)


def mm_infer(image_or_video, instruct, model: VideoLLaMA2, tokenizer,
             modal: str = "video", **kwargs) -> str:
    """Single-sample multimodal inference; parity videollama2/__init__.py:32-114.

    image_or_video: [T, H, W, 3] numpy — float32 (host-normalized, HF
    parity) or uint8 (resized raw RGB, normalized on device) — or packed
    planar I420 [T, H*3/2, W] uint8 from the wire="i420" processors
    (media/wire.py); all three are produced by this package's processors
    and decode identically up to the documented chroma delta.
    """
    cfg = model.config
    frames = None
    audio = None
    if modal == "audio":
        audio = _prep_audio(image_or_video, cfg)
    elif modal == "av":
        media = image_or_video
        if isinstance(media, str):
            # one video file: frames from the video stream, BEATs features
            # from the SAME file's audio track (reference README.md:130-132)
            arr = process_video(media, cfg=cfg.vision, aspect_ratio=None,
                                num_frames=cfg.num_frames or NUM_FRAMES,
                                out_dtype="uint8")
            audio = _prep_av_audio(media, cfg)
        else:  # {"video": frames, "audio": path-or-feats} (processor["av"])
            arr = np.asarray(media["video"])
            audio = _prep_audio(media["audio"], cfg)
        frames = np.asarray(arr)[None]
    elif modal not in ("text",):
        arr = np.asarray(image_or_video)
        if arr.dtype != np.uint8:  # uint8 rides through; normalize on device
            arr = arr.astype(np.float32)
        T = cfg.num_frames
        if modal == "image":
            # expand image to num_frames identical frames
            # (videollama2_arch.py:119-120)
            arr = np.broadcast_to(arr[:1], (T,) + arr.shape[1:])
        frames = arr[None]  # [1, T, H, W, 3]

    input_ids = build_prompt_ids(instruct, cfg, tokenizer, modal)

    gen = GenerationConfig(
        do_sample=kwargs.get("do_sample", False),
        temperature=kwargs.get("temperature",
                               0.2 if kwargs.get("do_sample", False) else 0.0),
        top_p=kwargs.get("top_p", 0.9),
        max_new_tokens=kwargs.get("max_new_tokens", 2048),
        seed=kwargs.get("seed", 0),
        speculative_k=kwargs.get("speculative_k", 0),
    )
    eos = tokenizer.eos_token_id
    outs = model.engine.generate([input_ids], frames=frames, audio=audio,
                                 gen=gen, eos_token_id=eos,
                                 image_mode=(modal == "image"),
                                 stream_cb=kwargs.get("stream_cb"))
    return tokenizer.decode(outs[0], skip_special_tokens=True).strip()


def mm_infer_batch(image_or_video, instructs, model: VideoLLaMA2, tokenizer,
                   modal: str = "video", **kwargs) -> list:
    """Batched variant of mm_infer: one media tensor, many prompts.

    The media is encoded ONCE and its tokens broadcast across the batch
    (engine share_media) — e.g. Video-MME's ~3 questions per video, or the
    sub/no-sub passes, decode together at 1x encode cost.
    """
    if modal == "image":
        modal_token = DEFAULT_IMAGE_TOKEN
    elif modal == "video":
        modal_token = DEFAULT_VIDEO_TOKEN
    else:
        raise ValueError(f"Unsupported modal for batch: {modal}")

    cfg = model.config
    arr = np.asarray(image_or_video, dtype=np.float32) \
        if np.asarray(image_or_video).dtype != np.uint8 \
        else np.asarray(image_or_video)
    T = cfg.num_frames
    if modal == "image":
        arr = np.broadcast_to(arr[:1], (T,) + arr.shape[1:])
    frames = arr[None]

    batch_ids = []
    for instruct in instructs:
        message = [{"role": "user",
                    "content": modal_token + "\n" + instruct}]
        if cfg.model_type in ("videollama2", "videollama2_mistral",
                              "videollama2_mixtral"):
            message = [{"role": "system",
                        "content": MISTRAL_SYSTEM}] + message
        prompt = tokenizer.apply_chat_template(message, tokenize=False,
                                               add_generation_prompt=True)
        batch_ids.append(
            tokenizer_multimodal_token(prompt, tokenizer, modal_token))

    gen = GenerationConfig(
        do_sample=kwargs.get("do_sample", False),
        temperature=kwargs.get("temperature",
                               0.2 if kwargs.get("do_sample", False)
                               else 0.0),
        top_p=kwargs.get("top_p", 0.9),
        max_new_tokens=kwargs.get("max_new_tokens", 2048),
        seed=kwargs.get("seed", 0))
    outs = model.engine.generate(batch_ids, frames=frames, gen=gen,
                                 eos_token_id=tokenizer.eos_token_id,
                                 share_media=True,
                                 image_mode=False)
    return [tokenizer.decode(o, skip_special_tokens=True).strip()
            for o in outs]


def _prep_av(video_path: str, cfg, num_frames: int) -> dict:
    """One video file -> {"video": [T,H,W,3] uint8, "audio": [1,T_a,128]}.

    The AV model consumes the clip's own audio track (reference
    README.md:130-132); feed the result to mm_infer(..., modal="av").
    A container with no decodable audio degrades to silence with a
    warning (same failure-tolerance posture as the eval harness's
    missing-media defaults) instead of failing the request."""
    return {"video": process_video(video_path, cfg=cfg.vision,
                                   aspect_ratio=None, num_frames=num_frames,
                                   out_dtype="uint8"),
            "audio": _prep_av_audio(video_path, cfg)}


def _prep_av_audio(video_path: str, cfg) -> "np.ndarray":
    try:
        return _prep_audio(video_path, cfg)
    except (IOError, OSError):
        import warnings
        warnings.warn(f"no decodable audio track in {video_path}; "
                      "AV request proceeds with silence", stacklevel=2)
        assert cfg.audio is not None
        return np.zeros((1, cfg.audio.max_frames, 128), np.float32)


def _prep_audio(audio_input, cfg) -> "np.ndarray":
    """Load/normalize audio to [1, audio.max_frames, 128] fbank features."""
    from ..media import audio as audio_lib
    assert cfg.audio is not None, "model has no audio branch"
    if isinstance(audio_input, str):
        # .wav or any video container: the AV model consumes the video
        # file's own audio track (reference README.md:130-132)
        wav = audio_lib.load_audio(audio_input)
        feats = audio_lib.beats_preprocess(wav)
    else:
        arr = np.asarray(audio_input, dtype=np.float32)
        if arr.ndim == 3:  # already [1, T, 128] from the processor
            arr = arr[0]
        feats = (audio_lib.beats_preprocess(arr) if arr.ndim == 1 else arr)
    T = cfg.audio.max_frames
    if feats.shape[0] < T:
        feats = np.pad(feats, ((0, T - feats.shape[0]), (0, 0)))
    return feats[None, :T]


class ChatSession:
    """Multi-turn chat with prefix-cached KV (beyond-reference serving).

    Each turn renders the FULL message history through the chat template
    and multimodal-tokenizes it (build_prompt_ids). When the ids consumed
    so far are a strict token prefix of the new render — true for the
    Llama2/Mistral/Qwen chat formats whenever the decoded answer
    retokenizes stably — only the new suffix feeds the engine
    (Engine.generate_continue): the media is encoded once and the history
    prefilled once across the whole conversation. Any prefix mismatch or
    cache overflow falls back transparently to a fresh full-prompt
    generate, so answers NEVER depend on prefix stability (and are always
    token-identical to per-turn mm_infer calls — tests/test_session.py).

    The reference re-runs its entire HF prefill (including the vision
    tower) on every turn of a conversation (serve/cli.py history loop).
    """

    def __init__(self, image_or_video, model: VideoLLaMA2, tokenizer,
                 modal: str = "video", **gen_kwargs):
        self.model = model
        self.tokenizer = tokenizer
        self.modal = modal
        self.media = image_or_video
        self.gen_kwargs = dict(gen_kwargs)
        self.messages: list = []
        self._session = None
        self.stats = {"cached_turns": 0, "fresh_turns": 0}

    def _gen(self):
        kw = self.gen_kwargs
        return GenerationConfig(
            do_sample=kw.get("do_sample", False),
            temperature=kw.get("temperature",
                               0.2 if kw.get("do_sample", False) else 0.0),
            top_p=kw.get("top_p", 0.9),
            max_new_tokens=kw.get("max_new_tokens", 2048),
            seed=kw.get("seed", 0),
            speculative_k=kw.get("speculative_k", 0))

    def ask(self, text: str) -> str:
        cfg = self.model.config
        eng = self.model.engine
        self.messages.append({"role": "user", "content": text})
        full_ids = build_prompt_ids(copy.deepcopy(self.messages), cfg,
                                    self.tokenizer, self.modal)
        sess = self._session
        outs = None
        if sess is not None:
            known = sess.token_history
            if (len(full_ids) > len(known)
                    and full_ids[:len(known)] == list(known)):
                try:
                    outs, self._session = eng.generate_continue(
                        sess, full_ids[len(known):], gen=self._gen(),
                        eos_token_id=self.tokenizer.eos_token_id)
                    self.stats["cached_turns"] += 1
                except ValueError:  # cache exhausted
                    outs = None
        if outs is None:
            frames = None
            audio = None
            if self.modal == "audio":
                audio = _prep_audio(self.media, cfg)
            elif self.modal == "av":
                media = self.media
                if isinstance(media, str):
                    arr = process_video(
                        media, cfg=cfg.vision, aspect_ratio=None,
                        num_frames=cfg.num_frames or NUM_FRAMES,
                        out_dtype="uint8")
                    audio = _prep_av_audio(media, cfg)
                else:
                    arr = np.asarray(media["video"])
                    audio = _prep_audio(media["audio"], cfg)
                frames = np.asarray(arr)[None]
            elif self.modal != "text":
                arr = np.asarray(self.media)
                if arr.dtype != np.uint8:
                    arr = arr.astype(np.float32)
                if self.modal == "image":
                    arr = np.broadcast_to(
                        arr[:1], (cfg.num_frames,) + arr.shape[1:])
                frames = arr[None]
            outs, self._session = eng.generate(
                [full_ids], frames=frames, audio=audio, gen=self._gen(),
                eos_token_id=self.tokenizer.eos_token_id,
                image_mode=(self.modal == "image"), return_session=True)
            self.stats["fresh_turns"] += 1
        reply = self.tokenizer.decode(
            outs[0], skip_special_tokens=True).strip()
        self.messages.append({"role": "assistant", "content": reply})
        return reply


class SessionStore:
    """Thread-safe LRU of engine Sessions keyed by media digest, matched by
    token-prefix — stateless serving's entry into prefix caching.

    A worker receives full message lists per request; `take` finds a stored
    session whose consumed ids are a strict prefix of the incoming render
    (same media) and REMOVES it (generate_continue donates the cache, so a
    session is single-use until re-`put`). Each live session holds a full
    KV cache on device (~1 GB at 7B bf16 / max_len 4096), so the default
    cap stays small.
    """

    def __init__(self, cap: int = 2):
        import threading
        self.cap = cap
        self._entries: list = []          # [(digest, Session)]
        self._lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0}

    @staticmethod
    def media_digest(media) -> Optional[str]:
        if media is None:
            return None
        import hashlib
        if isinstance(media, dict):  # AV: {"video": ..., "audio": ...}
            return "+".join(SessionStore.media_digest(media[k])
                            for k in sorted(media))
        if isinstance(media, str):   # path-typed media (audio/av files)
            return hashlib.md5(b"path:" + media.encode()).hexdigest()
        arr = np.ascontiguousarray(np.asarray(media))
        return hashlib.md5(
            arr.tobytes() + str(arr.shape).encode()).hexdigest()

    def take(self, digest, full_ids):
        with self._lock:
            for i, (d, sess) in enumerate(self._entries):
                known = sess.token_history
                if (d == digest and len(full_ids) > len(known)
                        and full_ids[:len(known)] == list(known)):
                    self._entries.pop(i)
                    self.stats["hits"] += 1
                    return sess
            self.stats["misses"] += 1
            return None

    def put(self, digest, session):
        with self._lock:
            self._entries.append((digest, session))
            while len(self._entries) > self.cap:
                self._entries.pop(0)


def mm_infer_session(image_or_video, instruct, model: VideoLLaMA2,
                     tokenizer, store: SessionStore, modal: str = "video",
                     **kwargs) -> str:
    """mm_infer with prefix caching through a SessionStore.

    Output is identical to mm_infer (tests/test_serve.py multi-turn); when
    the rendered prompt extends a stored session's ids over the same media,
    only the new tokens feed the engine (Engine.generate_continue).
    """
    cfg = model.config
    full_ids = build_prompt_ids(instruct, cfg, tokenizer, modal)
    digest = store.media_digest(
        None if modal == "text" else image_or_video)
    gen = GenerationConfig(
        do_sample=kwargs.get("do_sample", False),
        temperature=kwargs.get("temperature",
                               0.2 if kwargs.get("do_sample", False)
                               else 0.0),
        top_p=kwargs.get("top_p", 0.9),
        max_new_tokens=kwargs.get("max_new_tokens", 2048),
        seed=kwargs.get("seed", 0),
        speculative_k=kwargs.get("speculative_k", 0))
    eos = tokenizer.eos_token_id
    sess = store.take(digest, full_ids)
    outs = None
    if sess is not None:
        try:
            outs, sess = model.engine.generate_continue(
                sess, full_ids[len(sess.token_history):], gen=gen,
                eos_token_id=eos, stream_cb=kwargs.get("stream_cb"))
        except ValueError:  # cache exhausted: fall through to fresh
            outs = None
    if outs is None:
        frames = None
        audio = None
        if modal == "audio":
            audio = _prep_audio(image_or_video, cfg)
        elif modal == "av":
            media = image_or_video
            if isinstance(media, str):
                arr = process_video(media, cfg=cfg.vision, aspect_ratio=None,
                                    num_frames=cfg.num_frames or NUM_FRAMES,
                                    out_dtype="uint8")
                audio = _prep_av_audio(media, cfg)
            else:
                arr = np.asarray(media["video"])
                audio = _prep_audio(media["audio"], cfg)
            frames = np.asarray(arr)[None]
        elif modal != "text":
            arr = np.asarray(image_or_video)
            if arr.dtype != np.uint8:
                arr = arr.astype(np.float32)
            if modal == "image":
                arr = np.broadcast_to(arr[:1],
                                      (cfg.num_frames,) + arr.shape[1:])
            frames = arr[None]
        outs, sess = model.engine.generate(
            [full_ids], frames=frames, audio=audio, gen=gen,
            eos_token_id=eos, image_mode=(modal == "image"),
            stream_cb=kwargs.get("stream_cb"), return_session=True)
    store.put(digest, sess)
    return tokenizer.decode(outs[0], skip_special_tokens=True).strip()
