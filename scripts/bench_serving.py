"""Serving-throughput benchmark: concurrent requests against one worker.

Measures end-to-end requests/sec through the HTTP worker with and without
--dynamic-batch (serve/batching.py), demonstrating the continuous-batching
win: on the weight-bandwidth-bound TPU decode step, batch-8 decode costs
nearly the same wall clock as batch-1, so grouped requests multiply
throughput. The reference worker runs one HF generate per request
(reference serve/model_worker.py:271-300) and cannot batch at all.

Usage (tiny checkpoint, CPU):
    python scripts/make_tiny_checkpoint.py   # -> /tmp/tiny_vllama2_ckpt
    python scripts/bench_serving.py --model-path /tmp/tiny_vllama2_ckpt \
        --requests 8 --concurrency 8

On TPU pass a real checkpoint and raise --max-new-tokens.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(port: int, prompt: str, max_new: int) -> float:
    t0 = time.time()
    req = urllib.request.Request(
        f"http://localhost:{port}/worker_generate_stream",
        data=json.dumps({"prompt": prompt, "temperature": 0.0,
                         "max_new_tokens": max_new}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        raw = r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert chunks and chunks[-1]["error_code"] == 0, chunks[-1:]
    return time.time() - t0


def bench(worker, port: int, n: int, conc: int, max_new: int) -> dict:
    latencies = [None] * n
    sem = threading.Semaphore(conc)

    def go(i):
        with sem:
            latencies[i] = run_one(port, f"describe item {i} ?", max_new)

    t0 = time.time()
    threads = [threading.Thread(target=go, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return {"requests": n, "concurrency": conc, "wall_s": round(wall, 3),
            "req_per_s": round(n / wall, 3),
            "mean_latency_s": round(sum(latencies) / n, 3),
            "batcher": worker.batcher.stats if worker.batcher else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default, tiny checkpoints) or tpu (the "
                         "preloaded axon backend)")
    ap.add_argument("--modes", default="serial,dynamic",
                    help="comma list of serial,dynamic — run one at a time "
                         "when the model load dominates the time budget")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from videollama2_tpu.inference import api as api_lib
    from videollama2_tpu.serve import model_worker as worker_mod

    # load ONCE and share across modes: a 7B int8 tree is ~7.5 GB — two
    # copies (serial-mode worker still alive while the dynamic one loads)
    # RESOURCE_EXHAUST a 16 GB chip
    bundle = api_lib.model_init(args.model_path)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    results = {}
    for dynamic in [m == "dynamic" for m in modes]:
        worker = worker_mod.ModelWorker(
            "http://localhost:0", "http://localhost:0", args.model_path,
            model_name="bench", register=False, dynamic_batch=dynamic,
            preloaded=bundle)
        srv = ThreadingHTTPServer(("localhost", 0),
                                  worker_mod.make_handler(worker))
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        run_one(port, "warmup ?", args.max_new_tokens)  # compile B=1
        # burst warmup: the dynamic batcher compiles per GROUP size, so a
        # measured run must not pay the batch-8 compile inside the clock
        bench(worker, port, args.concurrency, args.concurrency,
              args.max_new_tokens)
        results["dynamic" if dynamic else "serial"] = bench(
            worker, port, args.requests, args.concurrency,
            args.max_new_tokens)
        srv.shutdown()
        worker.session_store = None  # free cached per-session KV caches
        print(f"[{'dynamic' if dynamic else 'serial '}] "
              f"{results['dynamic' if dynamic else 'serial']}",
              file=sys.stderr, flush=True)
    if "serial" in results and "dynamic" in results:
        s, d = results["serial"], results["dynamic"]
        print(json.dumps({"metric": "serving req/s (dynamic vs serial)",
                          "serial_req_per_s": s["req_per_s"],
                          "dynamic_req_per_s": d["req_per_s"],
                          "speedup": round(d["req_per_s"]
                                           / max(s["req_per_s"], 1e-9), 2),
                          "detail": results}))
    else:
        print(json.dumps({"metric": "serving req/s", "detail": results}))


if __name__ == "__main__":
    main()
