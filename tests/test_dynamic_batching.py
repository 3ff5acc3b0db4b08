"""Continuous batching (serve/batching.py): concurrent requests share one
engine call, padded to a batch tier, with per-request streaming.

The reference worker runs one HF generate per request (reference
serve/model_worker.py:271-300); this is the TPU-shaped replacement.
"""

import os
import sys
import threading
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def batch_stack(tmp_path_factory):
    from make_tiny_checkpoint import build_checkpoint
    from videollama2_tpu.inference import api as api_lib
    from videollama2_tpu.serve.batching import DynamicBatcher
    import jax.numpy as jnp

    ckpt = build_checkpoint(str(tmp_path_factory.mktemp("ckpt")))
    model, processor, tokenizer = api_lib.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(64, 192),
        attn_impl="xla")
    batcher = DynamicBatcher(model, tokenizer, max_batch=4, window_ms=300)
    return model, tokenizer, batcher


def _drain(q):
    chunks = []
    while True:
        kind, text = q.get(timeout=600)
        chunks.append((kind, text))
        if kind in ("done", "error"):
            return chunks


def test_concurrent_text_requests_share_a_batch(batch_stack):
    model, tokenizer, batcher = batch_stack
    b0 = batcher.stats["batches"]
    qs = [batcher.submit(f"count to {i} ?", "text", None, max_new_tokens=4)
          for i in range(3)]
    results = [_drain(q) for q in qs]
    for chunks in results:
        assert chunks[-1][0] == "done"
        assert isinstance(chunks[-1][1], str)
    # all three rode one engine call (window collected them)
    assert batcher.stats["batches"] == b0 + 1
    assert batcher.stats["max_group"] >= 3


def test_mixed_video_and_text_group(batch_stack):
    model, tokenizer, batcher = batch_stack
    cfg = model.config
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (T, H, H, 3), dtype=np.uint8)
    b0 = batcher.stats["batches"]
    out = {}

    def vid():
        out["v"] = _drain(batcher.submit(
            "what is shown ?", "video", frames, max_new_tokens=4))

    def txt():
        out["t"] = _drain(batcher.submit(
            "hello ?", "text", None, max_new_tokens=4))

    t1, t2 = threading.Thread(target=vid), threading.Thread(target=txt)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert out["v"][-1][0] == "done"
    assert out["t"][-1][0] == "done"
    assert batcher.stats["batches"] == b0 + 1  # one grouped call


def test_streaming_chunks_arrive_before_done(batch_stack):
    _, _, batcher = batch_stack
    q = batcher.submit("tell me a story", "text", None, max_new_tokens=8)
    chunks = _drain(q)
    kinds = [k for k, _ in chunks]
    assert kinds[-1] == "done"
    assert "chunk" in kinds[:-1]  # partials streamed before completion


def test_per_request_max_new_tokens_cap(batch_stack):
    _, tokenizer, batcher = batch_stack
    qa = batcher.submit("a ?", "text", None, max_new_tokens=2)
    qb = batcher.submit("b ?", "text", None, max_new_tokens=10)
    ra, rb = _drain(qa), _drain(qb)
    na = len(tokenizer(ra[-1][1]).input_ids)
    assert ra[-1][0] == "done" and rb[-1][0] == "done"
    # request a's text reflects at most its own cap (2 tokens + specials)
    assert na <= 4


def test_openai_server_dynamic_batch(batch_stack, tmp_path):
    """OpenAI-compatible server routes completions through the batcher:
    two concurrent chat completions share one engine call."""
    import json
    import urllib.request
    from http.server import ThreadingHTTPServer
    from videollama2_tpu.serve import openai_api as oai

    model, tokenizer, batcher = batch_stack
    backend = oai.OpenAIBackend.__new__(oai.OpenAIBackend)
    backend.model_name = "tiny"
    backend.model, backend.tokenizer = model, tokenizer
    backend.processor = None  # text-only requests in this test
    backend.batcher = batcher

    srv = ThreadingHTTPServer(("localhost", 0), oai.make_handler(backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    b0 = batcher.stats["batches"]
    out = {}

    def ask(tag):
        req = urllib.request.Request(
            f"http://localhost:{port}/v1/chat/completions",
            data=json.dumps({"messages": [
                {"role": "user", "content": f"say {tag} ?"}],
                "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out[tag] = json.loads(r.read())

    ts = [threading.Thread(target=ask, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    srv.shutdown()
    for tag in ("a", "b"):
        msg = out[tag]["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)
    assert batcher.stats["batches"] == b0 + 1  # shared one engine call


def test_submit_ignores_unsupported_gen_kwargs(batch_stack):
    """The worker forwards ONE kwargs dict to both the batched and the
    mm_infer paths; batch-1-only knobs (speculative_k) must be accepted
    and ignored here instead of raising TypeError."""
    _, _, batcher = batch_stack
    q = batcher.submit("hello there", "text", None, max_new_tokens=4,
                       speculative_k=8)
    while True:
        kind, text = q.get(timeout=300)
        if kind == "error":
            raise AssertionError(text)
        if kind == "done":
            assert isinstance(text, str)
            break
