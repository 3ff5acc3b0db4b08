"""Speculative-decode microbenchmark: plain vs prompt-lookup vs oracle.

Batch-1 greedy decode is the HBM-bandwidth worst case (every step reads the
full weight set for ONE token). This measures, at 7B-int8 scale on TPU
(tiny on CPU):

  * plain        — the chunked lax.scan decode loop (engine default)
  * lookup k=K   — real prompt-lookup drafting (acceptance depends on how
                   repetitive the greedy continuation is; random-weight
                   models accept ~0, so this bounds the OVERHEAD)
  * oracle k=K   — drafts served from a pre-recorded plain-greedy run
                   (acceptance = 100%): the speedup CEILING, bounded by the
                   per-verify-pass cost vs K sequential steps

Real-world acceptance sits between the two (prompt-lookup literature: 2-3x
on extractive/summarization workloads; video QA restating subtitle or
option text behaves the same way).

Env: SPEC_SIZE=tiny|7b (default by platform), SPEC_TOKENS, PLATFORM=cpu.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.inference import speculative as spec_lib
    from videollama2_tpu.inference.engine import Engine, GenerationConfig
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.ops import quant

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    size = os.environ.get("SPEC_SIZE", "7b" if on_tpu else "tiny")
    steps = int(os.environ.get("SPEC_TOKENS", "128" if on_tpu else "24"))

    if size == "tiny":
        cfg = cfglib.tiny_model()
        dtype = jnp.float32
        quantize = False
    else:
        cfg = cfglib.preset("videollama2_mistral")
        dtype = jnp.bfloat16
        quantize = True
    print(f"[spec-bench] init {size} params...", file=sys.stderr, flush=True)
    if quantize:
        # int8 packs built directly + filled on-device: a bf16 7B tree
        # plus its packs would OOM the 16 GB chip (utils/synthetic.py)
        from videollama2_tpu.utils import synthetic
        params = synthetic.synthetic_model_params(
            cfg, dtype=jnp.bfloat16, quantize_llm=True,
            llm_bits=int(os.environ.get("SPEC_BITS", "8")))
    else:
        params = vl2.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16 if on_tpu
                                 else jnp.float32)

    # prompt: text-only, mildly repetitive (what extractive answers echo)
    base = [3, 11, 12, 13, 5, 11, 12, 13, 9]
    prompt = (base * 8)[:64]
    max_len = 64 + steps + 16
    eng = Engine(cfg, params, dtype=dtype, max_len=max_len, buckets=(64,),
                 attn_impl="auto", decode_chunk=32)

    def run(gen, label, iters=3):
        # warmup/compile
        out = eng.generate([prompt], gen=gen, eos_token_id=-1)
        n = len(out[0])
        best = []
        for _ in range(iters):
            t0 = time.time()
            out = eng.generate([prompt], gen=gen, eos_token_id=-1)
            best.append((time.time() - t0) / len(out[0]) * 1e3)
        ms = float(np.median(best))
        print(f"[spec-bench] {label:14s} {ms:7.2f} ms/tok "
              f"({n} toks)", file=sys.stderr, flush=True)
        return ms, out[0]

    plain_gen = GenerationConfig(max_new_tokens=steps)
    ms_plain, ref_out = run(plain_gen, "plain")

    results = {"plain_ms_per_tok": round(ms_plain, 3)}
    real_propose = spec_lib.ngram_propose
    for k in (4, 8):
        gen = GenerationConfig(max_new_tokens=steps, speculative_k=k)
        spec_lib.ngram_propose = real_propose
        ms_lookup, out = run(gen, f"lookup k={k}")
        assert out == ref_out, "lookup speculative diverged from greedy"

        # oracle drafter: serve the recorded continuation (100% acceptance)
        def oracle(context, want, max_n=3, min_n=1, _ref=ref_out):
            tail = [t for t in context]
            # locate how many generated tokens are already in context by
            # suffix-matching against the recorded output
            for done in range(len(_ref), -1, -1):
                if done == 0 or tail[-done:] == _ref[:done]:
                    return _ref[done:done + want]
            return []
        spec_lib.ngram_propose = oracle
        ms_oracle, out = run(gen, f"oracle k={k}")
        assert out == ref_out, "oracle speculative diverged from greedy"
        results[f"lookup_k{k}_ms_per_tok"] = round(ms_lookup, 3)
        results[f"oracle_k{k}_ms_per_tok"] = round(ms_oracle, 3)
        results[f"oracle_k{k}_speedup"] = round(ms_plain / ms_oracle, 2)
    spec_lib.ngram_propose = real_propose

    # ---- batched speculation (per-row cache frontiers): B rotated
    # repetitive prompts, each row drafting from its own context
    B = int(os.environ.get("SPEC_B", "8"))
    prompts = [((base[i % len(base):] + base[:i % len(base)]) * 8)[:64]
               for i in range(B)]

    def run_b(gen, label, iters=3):
        outs = eng.generate(prompts, gen=gen, eos_token_id=-1)
        n = sum(len(o) for o in outs)
        best = []
        for _ in range(iters):
            t0 = time.time()
            outs = eng.generate(prompts, gen=gen, eos_token_id=-1)
            best.append((time.time() - t0) / sum(len(o) for o in outs)
                        * 1e3)
        ms = float(np.median(best))
        print(f"[spec-bench] {label:18s} {ms:7.2f} ms/tok aggregate "
              f"({n} toks)", file=sys.stderr, flush=True)
        return ms, outs

    ms_bplain, ref_b = run_b(GenerationConfig(max_new_tokens=steps),
                             f"plain B={B}")
    ms_bspec, out_b = run_b(
        GenerationConfig(max_new_tokens=steps, speculative_k=8),
        f"lookup B={B} k=8")
    assert out_b == ref_b, "batched speculative diverged from greedy"
    results[f"batch{B}_plain_ms_per_tok"] = round(ms_bplain, 3)
    results[f"batch{B}_lookup_k8_ms_per_tok"] = round(ms_bspec, 3)
    results[f"batch{B}_lookup_k8_speedup"] = round(ms_bplain / ms_bspec, 2)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
