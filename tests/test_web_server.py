"""Web chat server HTTP tests (upgrades the PARITY row from helper-only).

Drives serve/web_server.py end-to-end in proxy mode over localhost against
the same controller+worker stack as test_serve.py: page serve, a streamed
/generate through web server -> controller -> worker, base64 media routing
into the worker's `videos` payload, and /vote + conversation logging
(reference gradio_web_server.py:32-35,338-349 log parity).
"""

import base64
import json
import threading
import urllib.error
import urllib.request
from argparse import Namespace
from http.server import ThreadingHTTPServer

import pytest

from test_serve import _post, serve_stack  # noqa: F401 (fixture)


@pytest.fixture()
def web_stack(serve_stack, tmp_path, monkeypatch):  # noqa: F811
    from videollama2_tpu.serve import web_server as web_mod

    _, _, ctrl_port, _ = serve_stack
    logdir = tmp_path / "weblogs"
    monkeypatch.setattr(web_mod, "LOGDIR", str(logdir))
    backend = web_mod.WebBackend(Namespace(
        model_path=None, model_name="tiny",
        controller_address=f"http://localhost:{ctrl_port}"))
    srv = ThreadingHTTPServer(("localhost", 0),
                              web_mod.make_handler(backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield port, logdir
    srv.shutdown()


def _stream_chunks(raw: bytes):
    return [json.loads(c) for c in raw.split(b"\0") if c]


def test_page_serves(web_stack):
    port, _ = web_stack
    with urllib.request.urlopen(f"http://localhost:{port}/",
                                timeout=30) as r:
        body = r.read().decode()
    assert r.headers["Content-Type"].startswith("text/html")
    # the SPA carries the full chat surface: send/regenerate/clear/vote
    for needle in ("/generate", "/vote", "regenerate()", "clearChat()"):
        assert needle in body


def test_generate_proxies_stream_with_history(web_stack):
    port, logdir = web_stack
    with _post(f"http://localhost:{port}/generate",
               {"prompt": "and the dog ?",
                "history": [["what is the cat doing ?", "the cat sits."]]},
               timeout=600) as r:
        chunks = _stream_chunks(r.read())
    assert chunks and chunks[-1]["error_code"] == 0
    assert isinstance(chunks[-1]["text"], str)
    # conversation logged as JSON lines, media payloads stripped
    logs = list(logdir.glob("web-conv-*.json"))
    assert logs, "no conversation log written"
    recs = [json.loads(ln) for ln in logs[0].read_text().splitlines()]
    assert any(rec["type"] == "chat" and rec["prompt"] == "and the dog ?"
               for rec in recs)


def test_generate_routes_base64_video(web_stack, tmp_path):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                           dtype=np.uint8))
              for _ in range(4)]
    gif = tmp_path / "clip.gif"
    frames[0].save(str(gif), save_all=True, append_images=frames[1:],
                   duration=50)
    port, logdir = web_stack
    with _post(f"http://localhost:{port}/generate",
               {"prompt": "describe the video",
                "media_b64": base64.b64encode(gif.read_bytes()).decode(),
                "media_name": "clip.gif"},
               timeout=600) as r:
        chunks = _stream_chunks(r.read())
    assert chunks and chunks[-1]["error_code"] == 0
    # the b64 body must never land in the conversation log
    log = next(iter(logdir.glob("web-conv-*.json"))).read_text()
    assert "media_b64" not in log
    assert "clip.gif" in log


def test_vote_logged(web_stack):
    port, logdir = web_stack
    with _post(f"http://localhost:{port}/vote",
               {"vote": 1, "history": [["hi", "hello"]]}) as r:
        assert json.loads(r.read()) == {}
    recs = [json.loads(ln)
            for f in logdir.glob("web-conv-*.json")
            for ln in f.read_text().splitlines()]
    votes = [rec for rec in recs if rec["type"] == "vote"]
    assert votes and votes[-1]["vote"] == 1


def test_unknown_path_404(web_stack):
    port, _ = web_stack
    try:
        _post(f"http://localhost:{port}/nope", {})
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
