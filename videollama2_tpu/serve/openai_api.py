"""OpenAI-compatible chat-completions server.

The reference ships an SGLang delegation worker (serve/sglang_worker.py —
stale, image-only, imports a nonexistent package; SURVEY.md §2.1). Its role —
exposing the model behind a standard programmatic API — is filled here with
an OpenAI-style `/v1/chat/completions` endpoint (message content parts of
type `text`, `image_url`, `video_url` with file paths or data URLs), backed
by the same TPU engine. Supports streaming (SSE) and non-streaming modes.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..utils.logging import build_logger

logger = build_logger("openai_api", "openai_api.log")


class OpenAIBackend:
    # class-level default: tests build the backend via __new__
    session_store = None

    def __init__(self, model_path: str, model_name: str = None,
                 dynamic_batch: bool = False, wire: str = "i420"):
        from ..inference import api as api_lib
        from ..multimodal.tokenizer import get_model_name_from_path
        self.model_name = model_name or get_model_name_from_path(model_path)
        # serving default: I420 frame wire (half the host->device bytes;
        # media/wire.py) — wire="rgb" restores exact-chroma frames
        self.model, self.processor, self.tokenizer = api_lib.model_init(
            model_path, wire=wire)
        self.batcher = None
        self.session_store = None
        if dynamic_batch:
            from .batching import DynamicBatcher
            self.batcher = DynamicBatcher(self.model, self.tokenizer,
                                          max_batch=8)
        else:
            # prefix caching for multi-turn chat completions: a follow-up
            # request whose rendered prompt extends a cached session skips
            # the media encode + history prefill (inference/api.SessionStore)
            from ..inference.api import SessionStore
            self.session_store = SessionStore(cap=2)

    def _extract_media(self, messages):
        """Pull the first media part out of the message list; returns
        (tensor, modal, cleaned_messages)."""
        from PIL import Image
        tensor, modal = None, "text"
        cleaned = []
        for m in messages:
            content = m.get("content")
            if isinstance(content, list):
                texts = []
                for part in content:
                    t = part.get("type")
                    if t == "text":
                        texts.append(part["text"])
                    elif t in ("image_url", "video_url") and tensor is None:
                        url = part[t]["url"] if isinstance(part.get(t), dict)\
                            else part.get("url", "")
                        if url.startswith("data:"):
                            raw = base64.b64decode(url.split(",", 1)[1])
                            if t == "image_url":
                                img = Image.open(io.BytesIO(raw))
                                tensor = self.processor["image"](img)
                                modal = "image"
                            else:
                                tmp = f"/tmp/oai_{uuid.uuid4().hex}.mp4"
                                with open(tmp, "wb") as f:
                                    f.write(raw)
                                tensor = self.processor["video"](tmp)
                                modal = "video"
                        else:  # local path
                            path = url.replace("file://", "")
                            key = "image" if t == "image_url" else "video"
                            tensor = self.processor[key](path)
                            modal = key
                cleaned.append({"role": m["role"],
                                "content": "\n".join(texts)})
            else:
                cleaned.append({"role": m["role"], "content": content})
        return tensor, modal, cleaned

    def complete(self, body: dict):
        from ..inference.api import mm_infer
        messages = body.get("messages", [])
        tensor, modal, cleaned = self._extract_media(messages)
        # fold multi-turn into the instruct list the API accepts
        user_turns = [m for m in cleaned if m["role"] != "system"]
        instruct = (user_turns if len(user_turns) > 1
                    else user_turns[0]["content"] if user_turns else "")
        kwargs = dict(
            do_sample=body.get("temperature", 0) not in (0, None),
            temperature=body.get("temperature") or 0.2,
            top_p=body.get("top_p", 0.9),
            max_new_tokens=body.get("max_tokens", 512))
        if self.batcher is not None:
            # continuous batching: concurrent chat completions share one
            # engine call (serve/batching.py)
            q = self.batcher.submit(instruct, modal, tensor, **kwargs)
            while True:
                kind, text = q.get()
                if kind == "error":
                    raise RuntimeError(text)
                if kind == "done":
                    return text
        if self.session_store is not None:
            from ..inference.api import mm_infer_session
            return mm_infer_session(
                tensor, instruct, self.model, self.tokenizer,
                self.session_store, modal=modal, **kwargs)
        out = mm_infer(
            tensor, instruct, self.model, self.tokenizer, modal=modal,
            **kwargs)
        return out


def make_handler(backend: OpenAIBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s - %s" % (self.address_string(), fmt % args))

        def _send_json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/models":
                self._send_json({"object": "list", "data": [
                    {"id": backend.model_name, "object": "model"}]})
            else:
                self._send_json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            if self.path != "/v1/chat/completions":
                self._send_json({"error": "not found"}, 404)
                return
            try:
                text = backend.complete(body)
            except Exception as e:
                logger.exception("completion failed")
                self._send_json({"error": {"message": str(e)}}, 500)
                return
            rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
            if body.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                chunk = {"id": rid, "object": "chat.completion.chunk",
                         "created": int(time.time()),
                         "model": backend.model_name,
                         "choices": [{"index": 0,
                                      "delta": {"role": "assistant",
                                                "content": text},
                                      "finish_reason": None}]}
                self.wfile.write(b"data: " + json.dumps(chunk).encode()
                                 + b"\n\n")
                done = dict(chunk)
                done["choices"] = [{"index": 0, "delta": {},
                                    "finish_reason": "stop"}]
                self.wfile.write(b"data: " + json.dumps(done).encode()
                                 + b"\n\n")
                self.wfile.write(b"data: [DONE]\n\n")
            else:
                self._send_json({
                    "id": rid, "object": "chat.completion",
                    "created": int(time.time()),
                    "model": backend.model_name,
                    "choices": [{"index": 0,
                                 "message": {"role": "assistant",
                                             "content": text},
                                 "finish_reason": "stop"}],
                })

    return Handler


def main():
    from ..utils.misc import apply_platform_env
    apply_platform_env()  # PLATFORM=cpu offline drives (tunnel-less hosts)
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--model-name", default=None)
    ap.add_argument("--dynamic-batch", action="store_true",
                    help="continuous batching across concurrent requests")
    ap.add_argument("--wire", default="i420", choices=("i420", "rgb"),
                    help="host->device frame wire (media/wire.py)")
    args = ap.parse_args()
    backend = OpenAIBackend(args.model_path, args.model_name,
                            dynamic_batch=args.dynamic_batch,
                            wire=args.wire)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(backend))
    logger.info(f"openai api on http://{args.host}:{args.port}/v1")
    server.serve_forever()


if __name__ == "__main__":
    main()
