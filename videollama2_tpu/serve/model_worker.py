"""Serving model worker: loads the TPU model, registers to the controller,
streams generations.

Parity: reference videollama2/serve/model_worker.py:85-397 — registration +
15s heartbeats with queue length, a concurrency semaphore
(`--limit-model-concurrency`), base64-image / video-path decode, keyword
safety gate on input and streamed output, and \0-delimited JSON chunk
streaming — on stdlib HTTP. (The reference file has stale imports and does
not run as-is, SURVEY.md §2.1; this is the working equivalent.)
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tempfile
import threading
import time
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator, List, Optional


from ..constants import (DEFAULT_IMAGE_TOKEN, DEFAULT_VIDEO_TOKEN,
                         WORKER_HEART_BEAT_INTERVAL)
from ..utils.logging import build_logger, pretty_print_semaphore

logger = build_logger("model_worker", "model_worker.log")

worker_id = str(uuid.uuid4())[:6]

BANNED_WORDS: List[str] = []  # populated via --banned-words-file


def _check_safety(text: str) -> bool:
    low = text.lower()
    return not any(w in low for w in BANNED_WORDS)


class ModelWorker:
    # class-level defaults: tests (and any embedder) may build the worker
    # via __new__ + attribute assembly without running __init__
    speculative_k = 0
    session_store = None
    wire = "i420"

    def __init__(self, controller_addr: str, worker_addr: str,
                 model_path: str, model_name: Optional[str] = None,
                 limit_concurrency: int = 5, register: bool = True,
                 num_frames: Optional[int] = None,
                 dynamic_batch: bool = False,
                 speculative_k: int = 0,
                 session_cache: int = 2,
                 preloaded=None,
                 wire: str = "i420"):
        from ..inference import api as api_lib
        from ..multimodal.tokenizer import get_model_name_from_path

        # validate BEFORE the checkpoint load: a bad wire string must not
        # cost a multi-minute 7B model_init first
        if wire not in ("i420", "rgb", "fp32"):
            raise ValueError(f"wire must be i420|rgb|fp32, got {wire}")
        self.wire = wire
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.model_name = model_name or get_model_name_from_path(model_path)
        if preloaded is not None:
            # share an already-loaded (model, processor, tokenizer) — a 7B
            # weight tree fills most of a 16 GB chip, so embedders that run
            # several worker configs (scripts/bench_serving.py) must not
            # load it twice
            self.model, self.processor, self.tokenizer = preloaded
        else:
            logger.info(f"Loading model {self.model_name} on worker "
                        f"{worker_id} ...")
            self.model, self.processor, self.tokenizer = api_lib.model_init(
                model_path)
        self.batcher = None
        if dynamic_batch:
            from .batching import DynamicBatcher
            self.batcher = DynamicBatcher(self.model, self.tokenizer,
                                          max_batch=8)
        if num_frames:
            self.model.config = self.model.config.replace(
                num_frames=num_frames)
        # wire semantics (media/wire.py): "i420" ships planar YUV 4:2:0
        # (1.5 B/px, the decoder's native chroma — the default fast path),
        # "rgb" ships resized uint8 RGB (3 B/px, exact chroma), "fp32"
        # ships host-normalized floats (12 B/px, HF-float parity)
        self.speculative_k = speculative_k
        self.session_store = None
        if session_cache > 0 and not dynamic_batch:
            # prefix caching for multi-turn chat: follow-up turns skip the
            # vision encode + history prefill (inference/api.SessionStore);
            # each cached session holds a KV cache on device, so the cap is
            # small. Disabled under continuous batching (batch>1 engine
            # calls don't produce sessions).
            from ..inference.api import SessionStore
            self.session_store = SessionStore(cap=session_cache)
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.limit_concurrency = limit_concurrency
        self._queue = 0
        self._qlock = threading.Lock()

        if register:
            self.register_to_controller()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    # -- controller plumbing ----------------------------------------------

    def register_to_controller(self):
        logger.info("Register to controller")
        data = {"worker_name": self.worker_addr, "check_heart_beat": True,
                "worker_status": self.get_status()}
        req = urllib.request.Request(
            self.controller_addr + "/register_worker",
            data=json.dumps(data).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        urllib.request.urlopen(req, timeout=5).read()

    def _heartbeat_loop(self):
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            self.send_heart_beat()

    def send_heart_beat(self):
        logger.info(f"Send heart beat. Models: [{self.model_name}]. "
                    f"Semaphore: {pretty_print_semaphore(self.semaphore)}.")
        data = {"worker_name": self.worker_addr,
                "queue_length": self.get_queue_length()}
        try:
            req = urllib.request.Request(
                self.controller_addr + "/receive_heart_beat",
                data=json.dumps(data).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=5) as r:
                exist = json.loads(r.read())["exist"]
            if not exist:
                self.register_to_controller()
        except Exception as e:
            logger.error(f"heart beat error: {e}")

    def get_queue_length(self) -> int:
        with self._qlock:
            return self._queue

    def get_status(self) -> dict:
        return {"model_names": [self.model_name], "speed": 1,
                "queue_length": self.get_queue_length()}

    # -- generation --------------------------------------------------------

    def _decode_media(self, params: dict):
        """Returns (tensor, modal). Accepts base64 images or video paths
        (model_worker.py:182-203 equivalent)."""
        from PIL import Image
        from ..media.preprocess import process_image, process_video

        cfg = self.model.config
        vis_cfg = cfg.vision
        num_frames = cfg.num_frames
        out_dtype = "float32" if self.wire == "fp32" else "uint8"

        def _pack(arr):
            # i420 wire: pack resized uint8 RGB into planar YUV 4:2:0 —
            # halves the host->device bytes per request (media/wire.py;
            # lossy 4:2:0 chroma, documented delta, --wire rgb opts out)
            if self.wire == "i420":
                from ..media import wire as wire_lib
                return wire_lib.rgb_to_i420(arr)
            return arr
        images = params.get("images", None)
        video = params.get("video", None)
        audio = params.get("audio", None)
        videos_b64 = params.get("videos", None)
        if videos_b64:
            # base64-embedded video (web/proxy clients without a shared
            # filesystem): spool to a temp file for the container-sniffing
            # decoder
            name = params.get("video_name", "clip.mp4")
            suffix = os.path.splitext(name)[1] or ".mp4"
            with tempfile.NamedTemporaryFile(suffix=suffix,
                                             delete=False) as f:
                f.write(base64.b64decode(videos_b64[0]))
                video = f.name
        if video:
            # AV models consume the clip's own audio track alongside the
            # frames (reference README.md:130-132) unless the request
            # forces plain video via "modal": "video"
            want_av = (cfg.audio is not None
                       and params.get("modal", "av") == "av")
            try:
                if self.wire == "i420":
                    # full native path: C++ decode -> scale/crop in YUV ->
                    # packed I420, no host RGB round trip
                    # (media/preprocess.process_video_i420)
                    from ..media.preprocess import process_video_i420
                    tensor = process_video_i420(video, vis_cfg,
                                                num_frames=num_frames)
                else:
                    tensor = process_video(video, vis_cfg,
                                           aspect_ratio=None,
                                           num_frames=num_frames,
                                           out_dtype=out_dtype)
                if want_av:
                    from ..inference.api import _prep_av_audio
                    feats = _prep_av_audio(video, cfg)
                    return {"video": tensor, "audio": feats}, "av"
            finally:
                if videos_b64:
                    os.unlink(video)
            return tensor, "video"
        if audio is not None and cfg.audio is not None:
            # audio-only request: a .wav/container path on shared storage
            return audio, "audio"
        if images:
            img = Image.open(io.BytesIO(
                base64.b64decode(images[0]))).convert("RGB")
            tensor = _pack(process_image(img, vis_cfg, aspect_ratio=None,
                                         out_dtype=out_dtype))
            return tensor, "image"
        return None, "text"

    def generate_stream(self, params: dict) -> Iterator[bytes]:
        from ..inference.api import mm_infer
        # `prompt` is a string (single turn) or an mm_infer message list
        # [{role, content}, ...] (multi-turn web/proxy clients)
        prompt = params["prompt"]
        gate_text = prompt if isinstance(prompt, str) else " ".join(
            str(m.get("content", "")) for m in prompt)
        if not _check_safety(gate_text):
            yield json.dumps({"text": "input violates safety policy.",
                              "error_code": 1}).encode() + b"\0"
            return

        tensor, modal = self._decode_media(params)
        kwargs = dict(
            do_sample=bool(params.get("temperature", 0) > 0.001),
            temperature=float(params.get("temperature", 0.2)),
            top_p=float(params.get("top_p", 0.9)),
            max_new_tokens=min(int(params.get("max_new_tokens", 256)), 1024),
            # latency lever for single-stream greedy requests; the engine
            # no-ops it for sampled or batched generations. Per-request
            # override rides the JSON body.
            speculative_k=int(params.get("speculative_k",
                                         self.speculative_k)),
        )

        if self.batcher is not None and modal not in ("av", "audio"):
            # AV/audio requests bypass the batcher (it groups by the
            # vision/image/text modal kinds only)
            yield from self._generate_batched(prompt, modal, tensor, kwargs)
            return

        # stream by chunk: run the engine with a callback
        emitted = {"text": ""}
        stream_q: list = []
        done = threading.Event()

        def stream_cb(b, ids):
            text = self.tokenizer.decode(ids, skip_special_tokens=True)
            stream_q.append(text)

        def run():
            try:
                from ..inference import api as api_lib
                if self.session_store is not None:
                    out = api_lib.mm_infer_session(
                        tensor, prompt, self.model, self.tokenizer,
                        self.session_store, modal=modal,
                        stream_cb=stream_cb, **kwargs)
                else:
                    out = mm_infer(tensor, prompt, self.model,
                                   self.tokenizer, modal=modal,
                                   stream_cb=stream_cb, **kwargs)
                emitted["text"] = out
            except Exception as e:  # degrade like the reference worker
                logger.exception("generation failed")
                emitted["error"] = str(e)
            done.set()

        t = threading.Thread(target=run)
        with self._qlock:
            self._queue += 1
        try:
            self.semaphore.acquire()
            t.start()
            last = ""
            while not done.is_set() or stream_q:
                if stream_q:
                    last = stream_q.pop(0)
                    if not _check_safety(last):
                        yield json.dumps(
                            {"text": "output violates safety policy.",
                             "error_code": 1}).encode() + b"\0"
                        return
                    yield json.dumps({"text": last,
                                      "error_code": 0}).encode() + b"\0"
                else:
                    time.sleep(0.02)
            t.join()
        finally:
            self.semaphore.release()
            with self._qlock:
                self._queue -= 1
        if "error" in emitted:
            yield json.dumps({"text": "internal error",
                              "error_code": 1}).encode() + b"\0"
        else:
            yield json.dumps({"text": emitted["text"],
                              "error_code": 0}).encode() + b"\0"

    def _generate_batched(self, prompt, modal, tensor, kwargs
                          ) -> Iterator[bytes]:
        """Continuous-batching path (serve/batching.DynamicBatcher):
        concurrent requests share one engine call; tokens stream back
        per-request."""
        with self._qlock:
            self._queue += 1
        try:
            out_q = self.batcher.submit(prompt, modal, tensor, **kwargs)
            while True:
                kind, text = out_q.get()
                if kind == "error":
                    logger.error(f"batched generation failed: {text}")
                    yield json.dumps({"text": "internal error",
                                      "error_code": 1}).encode() + b"\0"
                    return
                if not _check_safety(text):
                    yield json.dumps(
                        {"text": "output violates safety policy.",
                         "error_code": 1}).encode() + b"\0"
                    return
                yield json.dumps({"text": text,
                                  "error_code": 0}).encode() + b"\0"
                if kind == "done":
                    return
        finally:
            with self._qlock:
                self._queue -= 1


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s - %s" % (self.address_string(), fmt % args))

        def _json_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def _send_json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            data = self._json_body()
            if self.path == "/worker_generate_stream":
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                for chunk in worker.generate_stream(data):
                    self.wfile.write(chunk)
                    self.wfile.flush()
            elif self.path == "/worker_get_status":
                self._send_json(worker.get_status())
            elif self.path == "/model_details":
                self._send_json(
                    {"context_length":
                     worker.model.config.llm.max_position_embeddings})
            elif self.path == "/count_token":
                p = data.get("prompt", "")
                if not isinstance(p, str):  # message-list prompts
                    p = " ".join(str(m.get("content", "")) for m in p)
                n = len(worker.tokenizer(p).input_ids)
                self._send_json({"count": n, "error_code": 0})
            else:
                self._send_json({"error": "unknown endpoint"}, 404)

    return Handler


def main():
    from ..utils.misc import apply_platform_env
    apply_platform_env()  # PLATFORM=cpu offline drives (tunnel-less hosts)
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--worker-address", default="http://localhost:21002")
    ap.add_argument("--controller-address", default="http://localhost:10000")
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--model-name", default=None)
    ap.add_argument("--limit-model-concurrency", type=int, default=5)
    ap.add_argument("--no-register", action="store_true")
    ap.add_argument("--num-frames", type=int, default=None)
    ap.add_argument("--banned-words-file", default=None)
    ap.add_argument("--dynamic-batch", action="store_true",
                    help="continuous batching: group concurrent requests "
                         "into one engine call (serve/batching.py)")
    ap.add_argument("--session-cache", type=int, default=2, metavar="N",
                    help="prefix-cache up to N chat sessions (KV cache "
                         "stays on device across turns); 0 disables")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="prompt-lookup speculative decoding: verify K "
                         "tokens per decode pass on greedy single-stream "
                         "requests (inference/speculative.py)")
    ap.add_argument("--wire", default="i420",
                    choices=("i420", "rgb", "fp32"),
                    help="host->device frame wire format: planar YUV 4:2:0 "
                         "(1.5 B/px, default), uint8 RGB (3 B/px, exact "
                         "chroma), or host-normalized fp32 (12 B/px, "
                         "HF-float parity). media/wire.py")
    args = ap.parse_args()

    if args.banned_words_file:
        with open(args.banned_words_file) as f:
            BANNED_WORDS.extend(
                w.strip().lower() for w in f if w.strip())

    worker = ModelWorker(args.controller_address, args.worker_address,
                         args.model_path, args.model_name,
                         args.limit_model_concurrency,
                         register=not args.no_register,
                         num_frames=args.num_frames,
                         dynamic_batch=args.dynamic_batch,
                         speculative_k=args.speculative,
                         session_cache=args.session_cache,
                         wire=args.wire)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(worker))
    logger.info(f"worker listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
