"""Speculative decoding: drafting, acceptance, verify-step and e2e parity.

The invariant under test everywhere: speculative greedy decoding emits
EXACTLY the token stream plain greedy decoding emits — speculation is a
latency optimization, never a semantics change (inference/speculative.py,
models/llm.py decode_verify).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.inference import speculative as spec
from videollama2_tpu.inference.engine import Engine, GenerationConfig
from videollama2_tpu.models import llm as llm_lib
from videollama2_tpu.models import videollama2 as vl2
from videollama2_tpu.multimodal import splice as splice_lib


# -- host-side units ---------------------------------------------------------

def test_ngram_propose_finds_longest_recent_match():
    #           0  1  2  3  4  5  6  7
    ctx = [10, 11, 12, 99, 10, 11, 12, 50, 10, 11, 12]
    # suffix 3-gram (10,11,12) last occurred at 4 -> continuation [50, 10]
    assert spec.ngram_propose(ctx, 2, max_n=3) == [50, 10]


def test_ngram_propose_most_recent_occurrence_wins():
    ctx = [1, 2, 7, 1, 2, 8, 1, 2]
    # bigram (1,2) matches at 3 (ahead of 0) -> continuation starts with 8
    assert spec.ngram_propose(ctx, 3, max_n=3) == [8, 1, 2]


def test_ngram_propose_no_match_returns_empty():
    assert spec.ngram_propose([1, 2, 3, 4, 5], 4) == []
    assert spec.ngram_propose([], 4) == []
    assert spec.ngram_propose([1], 4) == []


def test_ngram_propose_match_at_tail_falls_to_shorter_gram():
    # trigram suffix matches only itself; bigram (2,3) occurs earlier
    ctx = [2, 3, 9, 1, 2, 3]
    assert spec.ngram_propose(ctx, 1, max_n=3) == [9]


def test_accept_drafts():
    # all accepted
    assert spec.accept_drafts([5, 6], [5, 6, 7]) == ([5, 6, 7], 2)
    # first rejected: emit only greedy[0]
    assert spec.accept_drafts([9, 6], [5, 6, 7]) == ([5], 0)
    # partial
    assert spec.accept_drafts([5, 9], [5, 6, 7]) == ([5, 6], 1)
    # no drafts (k=1 degenerate): plain single-step decode
    assert spec.accept_drafts([], [5]) == ([5], 0)


# -- device-side verify step -------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _text_prefill(cfg, params, prompt, bucket, max_len):
    plan = splice_lib.plan_batch([prompt], cfg.tokens_per_video, bucket)
    embeds = llm_lib.embed_tokens(params["llm"],
                                  jnp.asarray(plan.text_ids),
                                  dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(bucket)[None], (1, bucket))
    cache = llm_lib.init_cache(cfg.llm, 1, max_len, jnp.float32)
    last, cache = llm_lib.prefill(params["llm"], cfg.llm, embeds, positions,
                                  jnp.asarray(plan.valid_len), cache,
                                  attn_impl="xla")
    return plan, last, cache


@pytest.mark.parametrize("sliding_window", [None, 24])
def test_decode_verify_matches_sequential_steps(tiny, sliding_window):
    """decode_verify's slot-i logits == the i-th sequential decode_step's."""
    import dataclasses
    cfg, params = tiny
    if sliding_window is not None:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm,
                                         sliding_window=sliding_window))
    bucket, max_len, K = 32, 64, 5
    prompt = [3, 4, 5, 6, 7, 8]
    plan, last, cache_a = _text_prefill(cfg, params, prompt, bucket, max_len)
    cache_b = jax.tree.map(jnp.copy, cache_a)
    valid = jnp.asarray(plan.valid_len)

    rng = np.random.default_rng(1)
    toks = [int(t) for t in rng.integers(3, cfg.llm.vocab_size - 1, K)]

    # sequential: K decode_steps
    seq_logits = []
    for i, t in enumerate(toks):
        te = llm_lib.embed_tokens(params["llm"], jnp.asarray([[t]]),
                                  dtype=jnp.float32)
        logits, cache_a = llm_lib.decode_step(
            params["llm"], cfg.llm, te, cache_a, valid, bucket,
            jnp.int32(i))
        seq_logits.append(np.asarray(logits)[0])

    # one verify pass over the same K tokens
    te = llm_lib.embed_tokens(params["llm"], jnp.asarray([toks]),
                              dtype=jnp.float32)
    ver_logits, cache_v = llm_lib.decode_verify(
        params["llm"], cfg.llm, te, cache_b, valid, bucket, jnp.int32(0))
    ver_logits = np.asarray(ver_logits)[0]            # [K, V]

    np.testing.assert_allclose(ver_logits, np.stack(seq_logits),
                               rtol=2e-4, atol=2e-4)
    # cache contents agree over the written rows
    np.testing.assert_allclose(np.asarray(cache_v.k)[:, :, :bucket + K],
                               np.asarray(cache_a.k)[:, :, :bucket + K],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sliding_window", [None, 20])
def test_decode_verify_resume_mid_stream(tiny, sliding_window):
    """A verify block starting at step0>0 matches sequential decoding —
    including a binding sliding window (the logical-position mask path)."""
    import dataclasses
    cfg, params = tiny
    if sliding_window is not None:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm,
                                         sliding_window=sliding_window))
    bucket, max_len, K = 32, 64, 3
    prompt = [9, 8, 7, 6]
    plan, _, cache_a = _text_prefill(cfg, params, prompt, bucket, max_len)
    cache_b = jax.tree.map(jnp.copy, cache_a)
    valid = jnp.asarray(plan.valid_len)
    toks = [5, 11, 12, 13, 14]                        # 2 sequential + 3 block

    for i, t in enumerate(toks[:2]):
        te = llm_lib.embed_tokens(params["llm"], jnp.asarray([[t]]),
                                  dtype=jnp.float32)
        logits, cache_a = llm_lib.decode_step(
            params["llm"], cfg.llm, te, cache_a, valid, bucket, jnp.int32(i))
        _, cache_b = llm_lib.decode_step(
            params["llm"], cfg.llm, te, cache_b, valid, bucket, jnp.int32(i))
    seq = []
    for i, t in enumerate(toks[2:]):
        te = llm_lib.embed_tokens(params["llm"], jnp.asarray([[t]]),
                                  dtype=jnp.float32)
        logits, cache_a = llm_lib.decode_step(
            params["llm"], cfg.llm, te, cache_a, valid, bucket,
            jnp.int32(2 + i))
        seq.append(np.asarray(logits)[0])
    te = llm_lib.embed_tokens(params["llm"], jnp.asarray([toks[2:]]),
                              dtype=jnp.float32)
    ver, _ = llm_lib.decode_verify(params["llm"], cfg.llm, te, cache_b,
                                   valid, bucket, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(ver)[0], np.stack(seq),
                               rtol=2e-4, atol=2e-4)


# -- end-to-end engine parity ------------------------------------------------

def test_engine_speculative_matches_plain_greedy(tiny):
    cfg, params = tiny
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    prompt = [3, 4, VIDEO_TOKEN_INDEX, 5, 6, 5, 6, 5]  # repetitive: drafts hit
    steps = 12

    plain = Engine(cfg, params, dtype=jnp.float32, max_len=128,
                   buckets=(64,), attn_impl="xla", decode_chunk=4)
    ref = plain.generate([prompt], frames=frames,
                         gen=GenerationConfig(max_new_tokens=steps),
                         eos_token_id=-1)[0]

    for k in (2, 4):
        eng = Engine(cfg, params, dtype=jnp.float32, max_len=128,
                     buckets=(64,), attn_impl="xla", decode_chunk=4)
        got = eng.generate(
            [prompt], frames=frames,
            gen=GenerationConfig(max_new_tokens=steps, speculative_k=k),
            eos_token_id=-1)[0]
        assert got == ref, f"speculative_k={k} diverged"


def test_engine_speculative_eos_and_budget(tiny):
    """EOS parity and cache-budget tail both match the plain loop."""
    cfg, params = tiny
    prompt = [3, 4, 5, 6, 3, 4, 5]
    # max_len barely above the bucket: speculation must hand the tail to
    # the plain loop (budget - step0 < k)
    for max_len, steps in ((37, 8), (64, 40)):
        plain = Engine(cfg, params, dtype=jnp.float32, max_len=max_len,
                       buckets=(32,), attn_impl="xla", decode_chunk=4)
        ref = plain.generate([prompt],
                             gen=GenerationConfig(max_new_tokens=steps),
                             eos_token_id=7)[0]
        eng = Engine(cfg, params, dtype=jnp.float32, max_len=max_len,
                     buckets=(32,), attn_impl="xla", decode_chunk=4)
        got = eng.generate(
            [prompt],
            gen=GenerationConfig(max_new_tokens=steps, speculative_k=3),
            eos_token_id=7)[0]
        assert got == ref


def test_engine_speculative_ignored_for_sampling(tiny):
    """speculative_k is a no-op for sampling requests (still runs)."""
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64,
                 buckets=(32,), attn_impl="xla", decode_chunk=4)
    out = eng.generate(
        [[3, 4, 5]],
        gen=GenerationConfig(max_new_tokens=4, speculative_k=4,
                             do_sample=True, temperature=1.0, seed=1),
        eos_token_id=-1)
    assert len(out[0]) == 4


def test_decode_verify_per_row_step0(tiny):
    """Per-row frontier verify: rows at DIFFERENT decode offsets in one
    pass match each row's independent sequential decode_steps (the
    batched-speculation substrate)."""
    cfg, params = tiny
    bucket, max_len, K, B = 32, 64, 3, 2
    prompts = [[3, 4, 5, 6], [7, 8, 9, 10, 11]]
    plan = splice_lib.plan_batch(prompts, cfg.tokens_per_video, bucket)
    embeds = llm_lib.embed_tokens(params["llm"], jnp.asarray(plan.text_ids),
                                  dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(bucket)[None], (B, bucket))
    cache = llm_lib.init_cache(cfg.llm, B, max_len, jnp.float32)
    valid = jnp.asarray(plan.valid_len)
    _, cache = llm_lib.prefill(params["llm"], cfg.llm, embeds, positions,
                               valid, cache, attn_impl="xla")
    cache_seq = jax.tree.map(jnp.copy, cache)

    rng = np.random.default_rng(2)
    # row 0 starts at frontier 2, row 1 at frontier 0: pre-advance row 0
    # by feeding 2 tokens through BOTH paths first
    pre = [int(t) for t in rng.integers(3, cfg.llm.vocab_size - 1, 2)]
    toks = [[int(t) for t in rng.integers(3, cfg.llm.vocab_size - 1, K)]
            for _ in range(B)]

    # sequential reference: per-row independent decode_steps; lockstep API
    # forces feeding rows together, so use B=1 sub-caches
    seq_logits = [[], []]
    for b in range(B):
        sub = jax.tree.map(lambda a: a[:, b:b + 1], cache_seq)
        offset = 2 if b == 0 else 0
        feed = (pre if b == 0 else []) + toks[b]
        for i, t in enumerate(feed):
            te = llm_lib.embed_tokens(params["llm"], jnp.asarray([[t]]),
                                      dtype=jnp.float32)
            logits, sub = llm_lib.decode_step(
                params["llm"], cfg.llm, te, sub, valid[b:b + 1], bucket,
                jnp.int32(i))
            if i >= offset:
                seq_logits[b].append(np.asarray(logits)[0])

    # verify path: advance row 0 by 2 via a K=2 verify on row 0 only
    # (row 1 rides along at frontier 0 re-verifying junk that its real
    # pass below overwrites)... simpler: feed both rows the pre tokens,
    # then only row 0's frontier advances.
    te = llm_lib.embed_tokens(params["llm"], jnp.asarray([pre, pre]),
                              dtype=jnp.float32)
    _, cache = llm_lib.decode_verify(params["llm"], cfg.llm, te, cache,
                                     valid, bucket,
                                     jnp.asarray([0, 0], jnp.int32))
    # row 1's rows [bucket, bucket+2) now hold junk; its verify below
    # starts at frontier 0 and overwrites them before reading
    step0 = jnp.asarray([2, 0], jnp.int32)
    te = llm_lib.embed_tokens(params["llm"], jnp.asarray(toks),
                              dtype=jnp.float32)
    ver_logits, cache = llm_lib.decode_verify(
        params["llm"], cfg.llm, te, cache, valid, bucket, step0)
    ver_logits = np.asarray(ver_logits)
    for b in range(B):
        np.testing.assert_allclose(ver_logits[b], np.stack(seq_logits[b]),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"row {b}")


def test_engine_batched_speculative_matches_plain_greedy(tiny):
    """B>1 speculative greedy == plain batched greedy, per row — including
    a repetitive row (drafts accept), a non-repetitive row, and an
    early-EOS row advancing at different frontiers."""
    cfg, params = tiny
    prompts = [[3, 4, 5, 6, 5, 6, 5, 6],     # repetitive: drafts hit
               [9, 10, 11, 12, 13],          # drafts mostly miss
               [6, 6, 6, 6]]                 # whatever this row emits
    for max_len, steps, eos in ((64, 12, -1), (40, 20, 7)):
        plain = Engine(cfg, params, dtype=jnp.float32, max_len=max_len,
                       buckets=(32,), attn_impl="xla", decode_chunk=4)
        ref = plain.generate(prompts,
                             gen=GenerationConfig(max_new_tokens=steps),
                             eos_token_id=eos)
        for k in (2, 4):
            eng = Engine(cfg, params, dtype=jnp.float32, max_len=max_len,
                         buckets=(32,), attn_impl="xla", decode_chunk=4)
            got = eng.generate(
                prompts,
                gen=GenerationConfig(max_new_tokens=steps,
                                     speculative_k=k),
                eos_token_id=eos)
            assert got == ref, (f"batched speculative_k={k} "
                                f"(max_len={max_len}, eos={eos}) diverged")


def test_engine_speculative_int8_fused_qkv(tiny):
    """The single-chip serving config: int8 packs + fused q/k/v (Engine
    fuse_qkv default) + speculation. decode_verify must read the fused
    'qkv' q8 pack and stay token-identical to the plain q8 decode loop
    (which runs the layer-indexed Pallas kernels, interpret mode on CPU)."""
    from videollama2_tpu.ops import quant
    cfg, params = tiny
    qparams = dict(params)
    qparams["llm"] = quant.quantize_llm_params(params["llm"], bits=8)
    prompt = [3, 4, 5, 6, 3, 4, 5]

    plain = Engine(cfg, qparams, dtype=jnp.float32, max_len=64,
                   buckets=(32,), attn_impl="xla", decode_chunk=4)
    assert "qkv" in plain.params["llm"]["layers"]
    ref = plain.generate([prompt], gen=GenerationConfig(max_new_tokens=10),
                         eos_token_id=-1)[0]

    eng = Engine(cfg, qparams, dtype=jnp.float32, max_len=64,
                 buckets=(32,), attn_impl="xla", decode_chunk=4)
    got = eng.generate(
        [prompt],
        gen=GenerationConfig(max_new_tokens=10, speculative_k=3),
        eos_token_id=-1)[0]
    assert got == ref


def test_engine_speculative_with_lora_adapters(tiny):
    """QLoRA serving config: unmerged LoRA adapters over an int8 base.
    fuse_qkv must skip lora-carrying packs (TP/merge semantics) and the
    speculative path must apply the adapters identically to plain decode."""
    from videollama2_tpu.ops import quant
    from videollama2_tpu.train import lora as lora_lib
    cfg, params = tiny
    qllm = quant.quantize_llm_params(params["llm"], bits=8)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, targets=("q", "k", "v", "o"))
    qllm = lora_lib.inject_lora(jax.random.PRNGKey(1), qllm, lcfg)
    layers = dict(qllm["layers"])
    for name in ("q", "k", "v", "o"):
        lo = dict(layers[name]["lora"])
        # nonzero delta so the adapters actually change outputs
        lo["b"] = 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                           lo["b"].shape, lo["b"].dtype)
        layers[name] = dict(layers[name], lora=lo)
    qparams = dict(params, llm=dict(qllm, layers=layers))
    prompt = [3, 4, 5, 6, 3, 4, 5]

    plain = Engine(cfg, qparams, dtype=jnp.float32, max_len=64,
                   buckets=(32,), attn_impl="xla", decode_chunk=4)
    assert "qkv" not in plain.params["llm"]["layers"], \
        "fuse_qkv must skip lora-carrying packs"
    ref = plain.generate([prompt], gen=GenerationConfig(max_new_tokens=10),
                         eos_token_id=-1)[0]

    eng = Engine(cfg, qparams, dtype=jnp.float32, max_len=64,
                 buckets=(32,), attn_impl="xla", decode_chunk=4)
    got = eng.generate(
        [prompt],
        gen=GenerationConfig(max_new_tokens=10, speculative_k=3),
        eos_token_id=-1)[0]
    assert got == ref
