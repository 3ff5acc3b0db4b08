"""End-to-end benchmark: 16-frame video QA throughput on one TPU chip.

Measures the north-star metric (BASELINE.json): videos/sec for the
VideoLLaMA2-7B-16F inference path — 16-frame CLIP ViT-L/336 encode + STC
connector + Mistral-7B prefill (~1.5k spliced tokens) + short greedy decode —
on randomly initialized bf16 weights (released checkpoints are not
downloadable in this environment; FLOPs and memory traffic are identical).

Baseline: the reference publishes no A100 throughput number (BASELINE.md), so
`vs_baseline` is computed against an ANALYTIC A100-80GB estimate of the same
workload, documented in `_analytic_a100_videos_per_sec` below. Replace with a
measured number when a GPU host is available.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "videos/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NUM_FRAMES = 16
DECODE_TOKENS = 32  # Video-MME MC answers are short (one letter + rationale)
# batched serving (config 5); 16 is the headline default since round 5 —
# the int8 KV cache halves the cache HBM so 7B int8 + B=16 fits 16 GB and
# amortizes the weight-bound decode ~2x better per video (BASELINE.md)
BATCH = int(os.environ.get("BENCH_BATCH", "16"))


def _analytic_a100_videos_per_sec(batch: int) -> float:
    """Analytic A100-80G estimate for the same workload at `batch`.

    Per video:
      encode: 16 frames x ViT-L/336 (~175 GFLOP/frame, 577 tok) = 2.8 TF
      connector: STC RegNet+conv3d ~ 1.5 TF
      prefill: ~1500 tokens x 7B x 2 = 21 TF
      -> 25.25 TF / (312 TF/s * 0.5 MFU) = 0.162 s (scales with batch)
    decode: 32 steps, weight-bound: 32 x 14 GB / 2.0 TB/s = 0.224 s
    (batch-independent while decode stays weight-read-bound).
    batch=8  -> 8 / (8*0.162 + 0.224)  = 5.3 videos/sec
    batch=16 -> 16 / (16*0.162 + 0.224) = 5.7 videos/sec
    North star (BASELINE.md) is v5e-8 vs A100: vs_baseline extrapolates the
    measured single-chip rate x8 chips (video-level parallelism is
    embarrassingly parallel across the slice) over this analytic number.
    """
    return round(batch / (batch * 0.162 + 0.224), 2)


def _run(quantize_llm: bool):
    import jax
    if os.environ.get("PLATFORM") == "cpu":
        # CPU smoke / tunnel-down escape hatch (the preloaded axon platform
        # hangs indefinitely when the TPU tunnel is unreachable)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # persistent compile cache: first run on this host pays the (very slow,
    # single-core) compile; subsequent bench invocations start hot
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # persist even sub-second programs: the engine-build concats / scale
    # casts and warmup helpers are dozens of tiny compiles that used to
    # miss EVERY run (min_compile_time 1.0 never wrote them — the
    # BENCH_r04 "hit: 0, miss: 15" mystery was exactly these, plus hits
    # logging at DEBUG where the counter couldn't see them)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:  # log WHY a compile missed the persistent cache (warmup diagnosis)
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    # capture miss lines (jax._src.compiler logs them at WARNING under the
    # flag above; hits only log at DEBUG and stay invisible) into a
    # committed-able artifact + a counter: BENCH_rN only keeps the output
    # tail, so warmup diagnosis must survive on disk.
    import logging as _logging
    cache_log = {"hit": 0, "miss": 0}
    # latest run only (ADVICE r3): truncate instead of appending forever
    try:
        open("/root/repo/bench_cache_misses.txt", "w").close()
    except OSError:
        pass

    class _CacheLogHandler(_logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            kind = ("miss" if "CACHE MISS" in msg
                    else "hit" if "cache hit" in msg else None)
            if kind is None:
                return
            cache_log[kind] += 1
            try:
                # .txt at repo root (NOT under gitignored .jax_cache/): the
                # driver commits stray worktree files at round end, so the
                # miss log survives for next-round diagnosis
                with open("/root/repo/bench_cache_misses.txt", "a") as f:
                    f.write(msg[:300] + "\n")
            except OSError:
                pass
    _compiler_logger = _logging.getLogger("jax._src.compiler")
    _compiler_logger.addHandler(_CacheLogHandler())
    # cache HITS log at DEBUG (jax only raises them to WARNING under
    # jax_log_compiles); open the logger to DEBUG so the handler counts
    # them — stderr stays clean because the root lastResort handler still
    # filters below WARNING
    _compiler_logger.setLevel(_logging.DEBUG)

    class _TraceMissToFile(_logging.Filter):
        # jax_explain_cache_misses also makes partial_eval WARN on every
        # tracing-cache miss; keep those in the file for diagnosis but OFF
        # stderr, so the driver-preserved bench tail shows bench lines
        # (VERDICT r3 #9), not retrace explanations.
        def filter(self, record):
            msg = record.getMessage()
            if "TRACING CACHE MISS" not in msg:
                return True
            try:
                with open("/root/repo/bench_cache_misses.txt", "a") as f:
                    f.write(msg[:300] + "\n")
            except OSError:
                pass
            return False
    _logging.getLogger(
        "jax._src.interpreters.partial_eval").addFilter(_TraceMissToFile())
    try:
        n_cached = len(os.listdir("/root/repo/.jax_cache"))
    except OSError:
        n_cached = 0
    print(f"[bench] persistent cache entries at start: {n_cached}",
          file=sys.stderr, flush=True)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.inference.engine import Engine, GenerationConfig
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.ops import quant
    from videollama2_tpu.constants import VIDEO_TOKEN_INDEX

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    # BENCH_SMALL_FULL=1: run the FULL TPU-branch logic (int8 packs, int8
    # tower, tight bucket, pipelined iters) on the tiny CPU config — a
    # regression net for the driver's real run, where these branches
    # otherwise execute for the first time (tests/test_bench_paths.py)
    full_path = on_tpu or os.environ.get("BENCH_SMALL_FULL") == "1"

    # BENCH_MODEL=qwen2 measures the 2.1-family flagship instead
    # (SigLIP-SO400M/384 x 729 patch tokens + Qwen2-7B, GQA 4 kv heads)
    model = os.environ.get("BENCH_MODEL", "mistral")
    preset = {"mistral": "videollama2_mistral",
              "qwen2": "videollama2_qwen2"}.get(model)
    if preset is None:
        raise SystemExit(f"unknown BENCH_MODEL={model}")
    cfg = cfglib.preset(preset).replace(num_frames=NUM_FRAMES)
    if not on_tpu:
        # CPU smoke fallback so the script always emits a line
        cfg = cfglib.tiny_model()

    # Build timing-equivalent weights DIRECTLY ON THE DEVICE: values don't
    # affect MXU/HBM timing, so the tree is constant fills — shaped
    # abstractly on the host (eval_shape, zero FLOPs) and materialized by
    # ONE jitted device-side program. Round 3 built the same fills on the
    # host CPU and let the Engine device_put them: 666 s for ~7.5 GB over
    # the ~11 MB/s tunnel (BENCH_r03). On-device fills write at HBM
    # bandwidth and transfer nothing (VERDICT r3 #1a). int8 packs are built
    # directly (never materializing bf16+int8 together in the 16 GB HBM).
    from videollama2_tpu.utils import synthetic

    abstract = jax.eval_shape(
        lambda: vl2.init_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16 if on_tpu
                                else jnp.float32))
    wcfg = "bf16"
    if quantize_llm and full_path:
        # weight-only int8 LLM: halves HBM footprint and roughly doubles
        # the bandwidth-bound decode (dequant fused in-graph, ops/quant).
        # The frozen tower's stacked linears go int8 too (bitsandbytes
        # load_8bit wraps every nn.Linear incl. the vision tower,
        # reference model/__init__.py:59-69); encode then runs W8A8 MXU
        # dots inside the prefill context. qwen2's 152k-vocab embed +
        # lm_head (2.2 GB bf16) also go int8 to fit 16 GB HBM.
        # BENCH_BITS=4 opts the LLM into the folded-nibble int4 pack
        # (load_4bit parity) — measured FASTER than int8 since the
        # offset-binary unpack (11.0 vs 13.6 ms/tok decode, BASELINE.md);
        # int8 stays the default for round-over-round comparability.
        bench_bits = int(os.environ.get("BENCH_BITS", "8"))
        abstract = synthetic.quantized_abstract(
            abstract, quantize_llm=True, quantize_vision=True,
            quantize_embed=(model == "qwen2"), llm_bits=bench_bits)
        wcfg = f"int{bench_bits}-weights"

    # BENCH_KV_BITS=8 (default since round 5): int8 KV cache
    # (models/llm.init_cache kv_bits=8) — halves the decode-attention HBM
    # reads AND the cache footprint, which is what makes BENCH_BATCH=16 fit
    # a 16 GB chip at 7B int8 weights. Accuracy-free: teacher-forced KL vs
    # the bf16 cache 2.7e-8, top-1 agreement 100% (eval/quant_accuracy).
    kv_bits = int(os.environ.get("BENCH_KV_BITS", "8")) if full_path else 16
    if kv_bits == 8:
        wcfg += "+kv8"

    t0 = time.time()
    params = synthetic.materialize_fills(abstract)
    t_fill = time.time() - t0

    H = cfg.vision.image_size
    T = cfg.num_frames
    rng = np.random.default_rng(0)
    # serving fast path wire format (media/wire.py): planar I420 uint8
    # (1.5 bytes/px — the decoder's native 4:2:0; YUV->RGB + normalize run
    # on device, fused into the tower) vs resized uint8 RGB (3 bytes/px).
    # Host->device copies serialize with compute on this tunnel, so wire
    # bytes are wall-clock per iteration. BENCH_WIRE=rgb opts out.
    wire_fmt = os.environ.get("BENCH_WIRE", "i420" if full_path else "rgb")
    frame_shape = ((BATCH, T, H + H // 2, H) if wire_fmt == "i420"
                   else (BATCH, T, H, H, 3))
    if wire_fmt == "i420":
        wcfg += "+i420wire"
    frames = rng.integers(0, 255, frame_shape, dtype=np.uint8)
    prompt = [1] + list(rng.integers(10, 1000, 40)) + [VIDEO_TOKEN_INDEX] \
        + list(rng.integers(10, 1000, 12))
    # tightest 128-aligned prefill bucket for the spliced prompt (the flash
    # kernel blocks adapt to any 128 multiple): 16-frame CLIP+STC splices
    # to 1574 tokens — padding that to a generic 2048 bucket would waste
    # 23% of prefill FLOPs and read 23% more KV rows every decode step
    spliced = len(prompt) - 1 + cfg.tokens_per_video
    tight_bucket = -(-spliced // 128) * 128

    print(f"[bench] params materialized on device ({wcfg}) in "
          f"{t_fill:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    eng = Engine(cfg, params,
                 dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                 max_len=((tight_bucket + DECODE_TOKENS) if full_path
                          else 128),
                 buckets=(tight_bucket,) if full_path else (64,),
                 decode_chunk=DECODE_TOKENS,
                 kv_bits=kv_bits)
    # params are already device-resident, so the constructor's device_put
    # is a no-op; the residue is the fp32->bf16 scale casts + qkv fusion,
    # batched into <=3 dispatches (engine._prepare_single_chip — the
    # per-leaf version measured 1.1-128 s here depending on tunnel load).
    # Drop the pre-fusion tree so the replaced q/k/v packs free their HBM.
    del params
    jax.block_until_ready(eng.params)
    np.asarray(jax.tree.leaves(eng.params)[0].ravel()[:8])
    t_params = time.time() - t0
    print(f"[bench] engine built in {t_params:.1f}s",
          file=sys.stderr, flush=True)
    gen = GenerationConfig(max_new_tokens=DECODE_TOKENS)

    # warmup (compile)
    t0 = time.time()
    print("[bench] compiling/warmup...", file=sys.stderr, flush=True)
    eng.generate([prompt] * BATCH, frames=frames, gen=gen, eos_token_id=-1)
    t_warmup = time.time() - t0
    print(f"[bench] warmup done in {t_warmup:.1f}s",
          file=sys.stderr, flush=True)

    # distinct frames per iteration: guards against any execution-level
    # result caching between host and device (identical input buffers);
    # >=12 iters (VERDICT r3 #1b — affordable now the 11-minute param
    # upload is gone) so the median survives tunnel-congestion outliers
    # (single iters measured 2.6-15.4 s for identical work, BASELINE.md).
    # Adaptive tail: keep iterating up to BENCH_MAX_ITERS while inside the
    # time budget, so quiet runs converge on more samples and congested
    # runs still finish.
    iters = int(os.environ.get("BENCH_ITERS", "12")) if on_tpu else 1
    max_iters = int(os.environ.get("BENCH_MAX_ITERS", "24")) if on_tpu else 1
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", "90"))
    frame_sets = [rng.integers(0, 255, frame_shape, dtype=np.uint8)
                  for _ in range(iters)]

    # stage attribution (always measured, emitted in the JSON `breakdown`
    # so the analytic-A100 comparison is auditable stage-by-stage and a
    # future measured-GPU number drops in): host->device transfer,
    # encode+prefill to first token, decode chunk — each bounded by a
    # device readback
    fr = frame_sets[0]
    # warm the upload + ravel-readback programs UNTIMED: the first
    # ravel[:8] on a new frame shape is a fresh (trivial) program whose
    # remote compile once measured 68.9 s under tunnel load — that is
    # compile queueing, not transfer, and must not be charged here
    warm = jax.device_put(frames)
    np.asarray(warm.ravel()[:8])
    del warm
    t0 = time.time()
    dev_frames = jax.device_put(fr)
    np.asarray(dev_frames.ravel()[:8])
    t_transfer = time.time() - t0
    print(f"[bench] transfer {fr.nbytes/1e6:.0f} MB: "
          f"{t_transfer:.3f}s", file=sys.stderr, flush=True)
    stamps = {}

    def cb(b, toks):
        stamps.setdefault(len(toks), time.time())
    t0 = time.time()
    eng.generate([prompt] * BATCH, frames=fr, gen=gen, eos_token_id=-1,
                 stream_cb=cb)
    t_end = time.time()
    t_first = min(stamps.values())
    t_prefill = t_first - t0
    decode_ms_per_tok = ((t_end - t_first)
                         / max(DECODE_TOKENS - 1, 1) * 1e3)
    print(f"[bench] encode+prefill+first-token: {t_prefill:.3f}s; "
          f"decode rest: {t_end-t_first:.3f}s "
          f"({decode_ms_per_tok:.1f} ms/tok); "
          f"total {t_end-t0:.3f}s", file=sys.stderr, flush=True)

    # pipelined upload: batch i+1's frames stream host->device while batch
    # i computes (Engine.upload_frames), the steady state of any serving
    # loop with a one-deep prefetch. Batch 0's upload is primed pre-clock;
    # its cost is paid by batch 1's compute window in steady state.
    def fresh_frames(i):
        if i < len(frame_sets):
            return frame_sets[i]
        return rng.integers(0, 255, frame_shape, dtype=np.uint8)

    dev = eng.upload_frames(frame_sets[0])
    times = []
    loop_t0 = time.time()
    i = 0
    while i < iters or (i < max_iters
                        and time.time() - loop_t0 < budget_s):
        t0 = time.time()
        last = not (i + 1 < iters
                    or (i + 1 < max_iters
                        and time.time() - loop_t0 < budget_s))
        nxt = None if last else eng.upload_frames(fresh_frames(i + 1))
        eng.generate([prompt] * BATCH, frames=dev, gen=gen,
                     eos_token_id=-1)
        times.append(time.time() - t0)
        dev = nxt if nxt is not None else dev
        i += 1
    # median per-iter time: the remote tunnel's load swings single
    # iterations by 2x (BASELINE.md methodology note); the median is the
    # honest steady-state figure
    dt = float(np.median(times))
    print(f"[bench] iter times: {[round(t, 3) for t in times]}",
          file=sys.stderr, flush=True)
    videos_per_sec = BATCH / dt

    baseline = _analytic_a100_videos_per_sec(BATCH)
    return {
        "metric": (f"videos/sec e2e ({T}-frame encode + prefill + "
                   f"{DECODE_TOKENS}-tok greedy decode, "
                   f"{('CLIP-L/336+STC+Mistral-7B ' if model == 'mistral' else 'SigLIP-400M/384+STCv35+Qwen2-7B ') + wcfg if on_tpu else 'tiny-cpu-smoke'}, "
                   f"batch {BATCH}, measured on 1 chip; vs_baseline = x8-chip "
                   f"v5e-8 extrapolation / analytic A100 batch-{BATCH})"),
        "value": round(videos_per_sec, 4),
        "unit": "videos/sec",
        "vs_baseline": round(videos_per_sec * 8 / baseline, 4),
        # machine-readable stage split (VERDICT r2 #7): audits the analytic
        # comparison per stage; slot a measured A100 in alongside later
        "breakdown": {
            "weights": wcfg, "model": model, "batch": BATCH, "frames": T,
            "kv_bits": kv_bits, "wire": wire_fmt,
            "params_fill_on_device_s": round(t_fill, 3),
            "engine_build_s": round(t_params, 3),
            "warmup_compile_s": round(t_warmup, 3),
            "persistent_cache": dict(cache_log),
            "transfer_s": round(t_transfer, 3),
            "transfer_mb": round(fr.nbytes / 1e6, 1),
            "encode_prefill_first_token_s": round(t_prefill, 3),
            "decode_ms_per_tok": round(decode_ms_per_tok, 2),
            "iter_times_s": [round(t, 3) for t in times],
            "median_iter_s": round(dt, 3),
            "min_iter_s": round(float(np.min(times)), 3),
            "iter_spread_s": round(float(np.max(times) - np.min(times)), 3),
            "best_per_chip_videos_per_sec": round(
                BATCH / float(np.min(times)), 4),
            "per_chip_videos_per_sec": round(videos_per_sec, 4),
            "analytic_a100_videos_per_sec": baseline,
        },
    }


def main():
    try:
        result = _run(quantize_llm=True)
    except Exception as e:  # noqa: BLE001 - emit a line no matter what
        result = {"metric": f"bench failed: {type(e).__name__}: {e}"[:400],
                  "value": 0.0, "unit": "videos/sec", "vs_baseline": 0.0}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
