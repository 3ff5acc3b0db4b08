"""Serving-plane tests: controller registry/dispatch + worker streaming.

Replaces the reference's manual smoke client (serve/test_message.py) with
automated loopback coverage: a controller and a worker (tiny checkpoint) on
localhost, a streamed generation through the controller proxy, heartbeat
bookkeeping, and dispatch policies.
"""

import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def _post(url, payload, timeout=30):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    return urllib.request.urlopen(req, timeout=timeout)


@pytest.fixture(scope="module")
def serve_stack(tmp_path_factory):
    from make_tiny_checkpoint import build_checkpoint
    from videollama2_tpu.serve import controller as ctrl_mod
    from videollama2_tpu.serve import model_worker as worker_mod

    ckpt = build_checkpoint(str(tmp_path_factory.mktemp("ckpt")))

    controller = ctrl_mod.Controller("shortest_queue")
    ctrl_srv = ThreadingHTTPServer(("localhost", 0),
                                   ctrl_mod.make_handler(controller))
    ctrl_port = ctrl_srv.server_address[1]
    threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()

    # build the worker with a tiny engine config (fast compile)
    worker = worker_mod.ModelWorker.__new__(worker_mod.ModelWorker)
    from videollama2_tpu.inference import api as api_lib
    import jax.numpy as jnp
    worker.controller_addr = f"http://localhost:{ctrl_port}"
    worker.model_name = "tiny"
    worker.model, worker.processor, worker.tokenizer = api_lib.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(64, 192),
        attn_impl="xla")
    worker.semaphore = threading.Semaphore(2)
    worker.limit_concurrency = 2
    worker.batcher = None
    worker._queue = 0
    worker._qlock = threading.Lock()

    wrk_srv = ThreadingHTTPServer(("localhost", 0),
                                  worker_mod.make_handler(worker))
    wrk_port = wrk_srv.server_address[1]
    worker.worker_addr = f"http://localhost:{wrk_port}"
    threading.Thread(target=wrk_srv.serve_forever, daemon=True).start()
    worker.register_to_controller()

    yield controller, worker, ctrl_port, wrk_port
    ctrl_srv.shutdown()
    wrk_srv.shutdown()


def test_register_and_list(serve_stack):
    controller, worker, ctrl_port, _ = serve_stack
    with _post(f"http://localhost:{ctrl_port}/list_models", {}) as r:
        models = json.loads(r.read())["models"]
    assert "tiny" in models


def test_dispatch_and_stream(serve_stack):
    _, _, ctrl_port, _ = serve_stack
    with _post(f"http://localhost:{ctrl_port}/get_worker_address",
               {"model": "tiny"}) as r:
        addr = json.loads(r.read())["address"]
    assert addr.startswith("http://localhost:")

    # stream a text-only generation through the controller proxy
    with _post(f"http://localhost:{ctrl_port}/worker_generate_stream",
               {"model": "tiny", "prompt": "what is the cat doing ?",
                "temperature": 0.0, "max_new_tokens": 6},
               timeout=600) as r:
        raw = r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert chunks, "no stream chunks"
    assert chunks[-1]["error_code"] == 0
    assert isinstance(chunks[-1]["text"], str)


def test_heartbeat_updates_queue(serve_stack):
    controller, worker, _, _ = serve_stack
    assert controller.receive_heart_beat(worker.worker_addr, 3)
    assert controller.worker_info[worker.worker_addr].queue_length == 3
    assert not controller.receive_heart_beat("http://nonexistent:1", 0)


def test_controller_hierarchy_two_level(serve_stack):
    """Controller-as-worker (reference controller.py:218-236): a parent
    controller sees a child controller as one worker and proxies a stream
    through parent -> child -> real worker."""
    from videollama2_tpu.serve import controller as ctrl_mod

    child, worker, child_port, _ = serve_stack
    parent = ctrl_mod.Controller("shortest_queue")
    parent_srv = ThreadingHTTPServer(("localhost", 0),
                                     ctrl_mod.make_handler(parent))
    parent_port = parent_srv.server_address[1]
    threading.Thread(target=parent_srv.serve_forever, daemon=True).start()
    try:
        ok = child.register_to_parent(
            f"http://localhost:{child_port}",
            f"http://localhost:{parent_port}")
        assert ok
        # parent lists the child's aggregate models
        with _post(f"http://localhost:{parent_port}/list_models", {}) as r:
            assert "tiny" in json.loads(r.read())["models"]
        # parent dispatch resolves to the child controller's address
        with _post(f"http://localhost:{parent_port}/get_worker_address",
                   {"model": "tiny"}) as r:
            addr = json.loads(r.read())["address"]
        assert addr == f"http://localhost:{child_port}"
        # two-level proxy: parent -> child -> worker stream
        with _post(f"http://localhost:{parent_port}/worker_generate_stream",
                   {"model": "tiny", "prompt": "what is the cat doing ?",
                    "temperature": 0.0, "max_new_tokens": 4},
                   timeout=600) as r:
            raw = r.read()
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert chunks and chunks[-1]["error_code"] == 0
        # parent heartbeat bookkeeping treats the child as a worker
        assert parent.receive_heart_beat(
            f"http://localhost:{child_port}",
            child.aggregate_status()["queue_length"])
    finally:
        parent_srv.shutdown()


def test_worker_status_endpoints(serve_stack):
    _, worker, _, wrk_port = serve_stack
    with _post(f"http://localhost:{wrk_port}/worker_get_status", {}) as r:
        status = json.loads(r.read())
    assert status["model_names"] == ["tiny"]
    with _post(f"http://localhost:{wrk_port}/count_token",
               {"prompt": "the cat"}) as r:
        assert json.loads(r.read())["count"] >= 1
    # message-list prompts (multi-turn web clients) count too
    with _post(f"http://localhost:{wrk_port}/count_token",
               {"prompt": [{"role": "user", "content": "the cat"},
                           {"role": "assistant", "content": "sits"}]}) as r:
        assert json.loads(r.read())["count"] >= 2


def test_worker_multiturn_message_list(serve_stack):
    """Multi-turn: the worker accepts an mm_infer message list as `prompt`
    (what web_server._messages produces for history-carrying chats)."""
    _, _, _, wrk_port = serve_stack
    msgs = [{"role": "user", "content": "what is the cat doing ?"},
            {"role": "assistant", "content": "the cat sits."},
            {"role": "user", "content": "and the dog ?"}]
    with _post(f"http://localhost:{wrk_port}/worker_generate_stream",
               {"prompt": msgs, "temperature": 0.0, "max_new_tokens": 4},
               timeout=600) as r:
        raw = r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert chunks and chunks[-1]["error_code"] == 0


def test_worker_base64_video(serve_stack, tmp_path):
    """Web/proxy clients without a shared filesystem send the video body
    base64-embedded (`videos`); the worker spools + decodes it."""
    import base64

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                           dtype=np.uint8))
              for _ in range(4)]
    gif = tmp_path / "clip.gif"
    frames[0].save(str(gif), save_all=True, append_images=frames[1:],
                   duration=50)
    b64 = base64.b64encode(gif.read_bytes()).decode()
    with _post(f"http://localhost:{wrk_port_of(serve_stack)}"
               "/worker_generate_stream",
               {"prompt": "describe the video", "videos": [b64],
                "video_name": "clip.gif", "temperature": 0.0,
                "max_new_tokens": 4}, timeout=600) as r:
        raw = r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert chunks and chunks[-1]["error_code"] == 0


def wrk_port_of(serve_stack):
    return serve_stack[3]


def test_worker_wire_formats(serve_stack, tmp_path):
    """_decode_media honors the wire format: i420 (default) ships planar
    [T, H*3/2, W] uint8 (half the RGB bytes), rgb ships uint8 [T, H, W, 3],
    fp32 ships host-normalized floats (media/wire.py)."""
    import numpy as np
    from PIL import Image

    _, worker, _, _ = serve_stack
    H = worker.model.config.vision.image_size
    rng = np.random.default_rng(1)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                           dtype=np.uint8))
              for _ in range(4)]
    gif = tmp_path / "wire.gif"
    frames[0].save(str(gif), save_all=True, append_images=frames[1:],
                   duration=50)

    old = worker.wire
    try:
        worker.wire = "i420"
        t, modal = worker._decode_media({"video": str(gif)})
        assert modal == "video" and t.dtype == np.uint8
        assert t.shape[-2:] == (H * 3 // 2, H)
        assert t.nbytes * 2 == np.prod(t.shape[:-2]) * H * H * 3

        worker.wire = "rgb"
        t, _ = worker._decode_media({"video": str(gif)})
        assert t.dtype == np.uint8 and t.shape[-3:] == (H, H, 3)

        worker.wire = "fp32"
        t, _ = worker._decode_media({"video": str(gif)})
        assert t.dtype == np.float32 and t.shape[-3:] == (H, H, 3)
    finally:
        worker.wire = old


def test_web_server_messages_helper():
    from videollama2_tpu.serve.web_server import WebBackend

    msgs = WebBackend._messages(
        {"prompt": "and now ?",
         "history": [["hi", "hello"], ["more", "sure"]]})
    assert msgs == [{"role": "user", "content": "hi"},
                    {"role": "assistant", "content": "hello"},
                    {"role": "user", "content": "more"},
                    {"role": "assistant", "content": "sure"},
                    {"role": "user", "content": "and now ?"}]


def test_worker_session_cache_multiturn(serve_stack):
    """Prefix-cached worker turns: same replies as stateless mode, the
    store registers a hit, and streaming yields incremental chunks (the
    engine stream_cb is wired through mm_infer)."""
    from videollama2_tpu.inference.api import SessionStore

    _, worker, ctrl_port, _ = serve_stack

    def turn(prompt):
        with _post(f"http://localhost:{ctrl_port}/worker_generate_stream",
                   {"model": "tiny", "prompt": prompt,
                    "temperature": 0.0, "max_new_tokens": 8},
                   timeout=600) as r:
            raw = r.read()
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert chunks[-1]["error_code"] == 0
        return chunks

    msgs = [{"role": "user", "content": "what is in the video ?"}]
    # stateless reference (store off)
    assert worker.session_store is None
    ref1 = turn(list(msgs))[-1]["text"]
    msgs2 = msgs + [{"role": "assistant", "content": ref1},
                    {"role": "user", "content": "and then what ?"}]
    ref2 = turn(list(msgs2))[-1]["text"]

    worker.session_store = SessionStore(cap=2)
    try:
        chunks1 = turn(list(msgs))
        assert chunks1[-1]["text"] == ref1
        assert len(chunks1) >= 2, "no incremental stream chunks"
        chunks2 = turn(list(msgs2))
        assert chunks2[-1]["text"] == ref2
        assert worker.session_store.stats["hits"] >= 1, (
            f"prefix cache never hit: {worker.session_store.stats}")
    finally:
        worker.session_store = None
