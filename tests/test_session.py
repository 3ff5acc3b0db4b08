"""Prefix-cached multi-turn sessions: continuation == fresh full prompt.

The invariant: a continued turn (media encoded once, history prefilled
once, new tokens fed through K-slot verify chunks) must emit exactly the
tokens a fresh generate() over the concatenated history emits — prefix
caching is a latency optimization, never a semantics change
(inference/engine.py Session / generate_continue).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.inference.engine import Engine, GenerationConfig
from videollama2_tpu.models import videollama2 as vl2


@pytest.fixture(scope="module")
def tiny():
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _frames(cfg, seed=0):
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, T, H, H, 3)).astype(np.float32)


def test_session_continue_matches_fresh(tiny):
    cfg, params = tiny
    frames = _frames(cfg)
    prompt1 = [3, 4, VIDEO_TOKEN_INDEX, 5, 6]
    turn2 = [9, 10, 11]
    g1 = GenerationConfig(max_new_tokens=5)
    g2 = GenerationConfig(max_new_tokens=6)

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    ans1, sess = eng.generate([prompt1], frames=frames, gen=g1,
                              eos_token_id=-1, return_session=True)
    assert sess.steps_done == len(ans1[0]) - 1
    ans2, sess2 = eng.generate_continue(sess, turn2, gen=g2,
                                        eos_token_id=-1)

    # fresh reference over the concatenated history
    fresh = Engine(cfg, params, dtype=jnp.float32, max_len=128,
                   buckets=(64,), attn_impl="xla", decode_chunk=4)
    combined = prompt1 + ans1[0] + turn2
    ref = fresh.generate([combined], frames=frames, gen=g2,
                         eos_token_id=-1)[0]
    assert ans2[0] == ref
    assert sess2.token_history == prompt1 + ans1[0] + turn2 + ans2[0]


def test_session_three_turns_and_speculative(tiny):
    cfg, params = tiny
    frames = _frames(cfg, seed=3)
    prompt1 = [3, VIDEO_TOKEN_INDEX, 5, 6, 5, 6]
    turns = [[7, 8], [9, 5, 6, 5]]
    g = GenerationConfig(max_new_tokens=4)
    gs = GenerationConfig(max_new_tokens=4, speculative_k=3)

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    ans, sess = eng.generate([prompt1], frames=frames, gen=g,
                             eos_token_id=-1, return_session=True)
    history = prompt1 + ans[0]
    fresh = Engine(cfg, params, dtype=jnp.float32, max_len=128,
                   buckets=(64,), attn_impl="xla", decode_chunk=4)
    for i, t in enumerate(turns):
        # alternate plain / speculative continuation; both must match fresh
        gen_i = gs if i % 2 else g
        ans_i, sess = eng.generate_continue(sess, t, gen=gen_i,
                                            eos_token_id=-1)
        ref = fresh.generate([history + t], frames=frames, gen=g,
                             eos_token_id=-1)[0]
        assert ans_i[0] == ref, f"turn {i + 2} diverged"
        history = history + t + ans_i[0]


def test_session_text_only_and_eos(tiny):
    """Text sessions work; EOS emitted mid-turn ends the turn the same way
    a fresh generation ends."""
    cfg, params = tiny
    prompt = [3, 4, 5, 6]
    g = GenerationConfig(max_new_tokens=8)
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=96, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    ans, sess = eng.generate([prompt], gen=g, eos_token_id=7,
                             return_session=True)
    ans2, _ = eng.generate_continue(sess, [11, 12], gen=g, eos_token_id=7)
    fresh = Engine(cfg, params, dtype=jnp.float32, max_len=96,
                   buckets=(32,), attn_impl="xla", decode_chunk=4)
    ref = fresh.generate([prompt + ans[0] + [11, 12]], gen=g,
                         eos_token_id=7)[0]
    assert ans2[0] == ref


@pytest.mark.parametrize("spec_k", [0, 3])
def test_session_after_mid_chunk_eos(tiny, spec_k):
    """Regression: EOS landing inside a decode chunk (or speculative round)
    leaves orphan cache rows past the last emitted token (forced-EOS /
    rejected-draft KVs). The session frontier must be the EMITTED token
    count, not the loop's step count — otherwise the continued turn attends
    garbage rows and diverges from a fresh generation."""
    cfg, params = tiny
    prompt = [3, 4, 5, 6, 3, 4]
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=96, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    # discover what the model greedily emits, then force EOS at the second
    # generated token: it lands mid-chunk (chunk=4) / mid-verify (k=3)
    probe = eng.generate([prompt], gen=GenerationConfig(max_new_tokens=6),
                         eos_token_id=-1)[0]
    eos = probe[1]
    g = GenerationConfig(max_new_tokens=6, speculative_k=spec_k)
    ans, sess = eng.generate([prompt], gen=g, eos_token_id=eos,
                             return_session=True)
    assert ans[0][-1] == eos and len(ans[0]) <= 3, \
        "setup failed: EOS not mid-chunk"
    assert sess.steps_done == len(ans[0]) - 1
    turn2 = [9, 10]
    ans2, _ = eng.generate_continue(sess, turn2, gen=g, eos_token_id=eos)
    fresh = Engine(cfg, params, dtype=jnp.float32, max_len=96,
                   buckets=(32,), attn_impl="xla", decode_chunk=4)
    ref = fresh.generate([prompt + ans[0] + turn2], gen=g,
                         eos_token_id=eos)[0]
    assert ans2[0] == ref


def test_session_cache_exhaustion_raises(tiny):
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=40, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    ans, sess = eng.generate([[3, 4, 5]],
                             gen=GenerationConfig(max_new_tokens=4),
                             eos_token_id=-1, return_session=True)
    with pytest.raises(ValueError, match="session cache exhausted"):
        eng.generate_continue(sess, list(range(3, 20)),
                              gen=GenerationConfig(max_new_tokens=4),
                              eos_token_id=-1)


def test_session_rejects_media_and_batch(tiny):
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    with pytest.raises(ValueError, match="batch-1"):
        eng.generate([[3, 4], [5, 6]], gen=GenerationConfig(max_new_tokens=2),
                     eos_token_id=-1, return_session=True)
    ans, sess = eng.generate([[3, 4, 5]],
                             gen=GenerationConfig(max_new_tokens=2),
                             eos_token_id=-1, return_session=True)
    with pytest.raises(AssertionError, match="text-only"):
        eng.generate_continue(sess, [VIDEO_TOKEN_INDEX, 4],
                              gen=GenerationConfig(max_new_tokens=2))


# -- API level: ChatSession over a real tokenized chat template --------------

def test_chat_session_matches_per_turn_mm_infer(tmp_path_factory):
    """ChatSession (prefix-cached turns) == stateless per-turn mm_infer with
    the full message history, through the real chat template + tokenizer of
    the tiny synthesized checkpoint; at least the later turns must take the
    cached path (token-prefix check holds for the Mistral template)."""
    import copy
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from make_tiny_checkpoint import build_checkpoint
    from videollama2_tpu.inference import api

    ckpt = build_checkpoint(str(tmp_path_factory.mktemp("ckpt")))
    model, processor, tokenizer = api.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(64, 192),
        attn_impl="xla")
    rng = np.random.default_rng(0)
    T = model.config.num_frames
    H = model.config.vision.image_size
    frames = rng.integers(0, 255, (T, H, H, 3), dtype=np.uint8)

    chat = api.ChatSession(frames, model, tokenizer, modal="video",
                           max_new_tokens=6)
    msgs = []
    for q in ("what is happening ?", "and after that ?", "why though ?"):
        reply = chat.ask(q)
        msgs.append({"role": "user", "content": q})
        ref = api.mm_infer(frames, copy.deepcopy(msgs), model, tokenizer,
                           modal="video", max_new_tokens=6)
        assert reply == ref, f"turn {len(msgs)} diverged"
        msgs.append({"role": "assistant", "content": reply})

    assert chat.stats["fresh_turns"] >= 1
    assert chat.stats["cached_turns"] >= 1, (
        "prefix cache never engaged — token-prefix check failed for the "
        f"tiny Mistral template (stats={chat.stats})")
