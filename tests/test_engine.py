"""End-to-end engine tests on a tiny random multimodal model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.inference.engine import Engine, GenerationConfig
from videollama2_tpu.models import llm as llm_lib
from videollama2_tpu.models import videollama2 as vl2
from videollama2_tpu.multimodal import splice as splice_lib


@pytest.fixture(scope="module")
def tiny():
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_engine_matches_stepwise_reference(tiny):
    """Engine greedy output == manual compose + full-forward argmax loop."""
    cfg, params = tiny
    T = cfg.num_frames
    H = cfg.vision.image_size
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    prompt = [3, 4, VIDEO_TOKEN_INDEX, 5, 6]
    steps = 6

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128,
                 buckets=(64,), attn_impl="xla", decode_chunk=4)
    out = eng.generate([prompt], frames=frames,
                       gen=GenerationConfig(max_new_tokens=steps),
                       eos_token_id=-1)  # never emitted -> full length
    got = out[0]
    assert len(got) == steps

    # stepwise reference: full forward re-run each step (no cache)
    tpm = cfg.tokens_per_video
    vis = vl2.encode_frames(params, cfg, jnp.asarray(frames),
                            attn_impl="xla")  # [1, tpm, D]
    toks = list(prompt)
    ref_out = []
    for _ in range(steps):
        plan = splice_lib.plan_batch([toks], tpm, 64)
        embeds = splice_lib.compose(params["llm"]["embed"]["weight"],
                                    vis, jnp.asarray(plan.text_ids),
                                    jnp.asarray(plan.is_visual),
                                    jnp.asarray(plan.vis_index))
        hidden, _ = llm_lib.forward(params["llm"], cfg.llm, embeds,
                                    jnp.asarray(plan.positions),
                                    jnp.asarray(plan.valid_len),
                                    attn_impl="xla")
        last = hidden[0, int(plan.valid_len[0]) - 1]
        logits = llm_lib.lm_logits(params["llm"], cfg.llm, last[None])
        nxt = int(jnp.argmax(logits, -1)[0])
        ref_out.append(nxt)
        toks.append(nxt)
    assert got == ref_out


def test_engine_text_only(tiny):
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    out = eng.generate([[3, 4, 5]], frames=None,
                       gen=GenerationConfig(max_new_tokens=4),
                       eos_token_id=-1)
    assert len(out[0]) == 4


def test_engine_eos_stops(tiny):
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    long = eng.generate([[3, 4, 5]], gen=GenerationConfig(max_new_tokens=12),
                        eos_token_id=-1)[0]
    # pick the 3rd emitted token as fake EOS: generation must stop there
    eos = long[2]
    out = eng.generate([[3, 4, 5]], gen=GenerationConfig(max_new_tokens=12),
                       eos_token_id=eos)[0]
    assert out[-1] == eos
    assert len(out) <= 3


def test_engine_batched(tiny):
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    singles = [eng.generate([[3, 4, 5]], gen=GenerationConfig(max_new_tokens=5),
                            eos_token_id=-1)[0],
               eng.generate([[9, 8]], gen=GenerationConfig(max_new_tokens=5),
                            eos_token_id=-1)[0]]
    batched = eng.generate([[3, 4, 5], [9, 8]],
                           gen=GenerationConfig(max_new_tokens=5),
                           eos_token_id=-1)
    assert batched == singles


def test_engine_moe_defaults_to_dense_dispatch():
    """Inference pins exact HF MoE semantics (VERDICT r2 #4): 'auto' would
    route every real Mixtral prefill (>=64 tokens) through the token-dropping
    capacity gather, risking answer parity under router imbalance. The
    Engine must rewrite auto->dense; explicit 'gather' is respected."""
    import dataclasses
    cfg = cfglib.tiny_model(model_type="videollama2_mixtral")
    assert cfg.llm.is_moe and cfg.llm.moe_dispatch == "auto"
    params = vl2.init_params(jax.random.PRNGKey(1), cfg)
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64, buckets=(32,),
                 attn_impl="xla", decode_chunk=4)
    assert eng.cfg.llm.moe_dispatch == "dense"
    # an explicit opt-in stays untouched
    gcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, moe_dispatch="gather"))
    eng_g = Engine(gcfg, params, dtype=jnp.float32, max_len=64,
                   buckets=(32,), attn_impl="xla", decode_chunk=4)
    assert eng_g.cfg.llm.moe_dispatch == "gather"
    # and the dense engine generates (the parity-exact path end to end)
    out = eng.generate([[3, 4, 5]], gen=GenerationConfig(max_new_tokens=3),
                       eos_token_id=-1)
    assert len(out[0]) == 3


def test_share_media_matches_replicated(tiny):
    """share_media=True (encode once, broadcast) == replicated frames."""
    cfg, params = tiny
    T = cfg.num_frames
    H = cfg.vision.image_size
    rng = np.random.default_rng(3)
    one = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    rep = np.broadcast_to(one, (2, T, H, H, 3)).copy()
    from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
    prompts = [[3, VIDEO_TOKEN_INDEX, 5], [7, VIDEO_TOKEN_INDEX, 8, 9]]

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    gen = GenerationConfig(max_new_tokens=5)
    a = eng.generate(prompts, frames=rep, gen=gen, eos_token_id=-1)
    b = eng.generate(prompts, frames=one, gen=gen, eos_token_id=-1,
                     share_media=True)
    assert a == b


def test_media_group_matches_replicated(tiny):
    """media_group (G videos, B prompts) == per-sample replicated frames."""
    cfg, params = tiny
    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(4)
    vids = rng.standard_normal((2, T, H, H, 3)).astype(np.float32)
    from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
    prompts = [[3, VIDEO_TOKEN_INDEX, 5],       # video 0
               [7, VIDEO_TOKEN_INDEX, 8, 9],    # video 0
               [2, VIDEO_TOKEN_INDEX, 6]]       # video 1
    group = [0, 0, 1]
    rep = vids[np.asarray(group)]

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    gen = GenerationConfig(max_new_tokens=4)
    a = eng.generate(prompts, frames=rep, gen=gen, eos_token_id=-1)
    b = eng.generate(prompts, frames=vids, gen=gen, eos_token_id=-1,
                     media_group=group)
    assert a == b


def test_decode_program_cached(tiny):
    """_get_decode must return the SAME jit wrapper across generate calls:
    a fresh wrapper per call re-traces and re-stages the decode executable
    every iteration (measured ~1.3-1.7 s per bench iteration on the 7B
    serving config — 66 ms/tok instead of 14)."""
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    a = eng._get_decode(False, 0.0, 0.9, 64)
    assert eng._get_decode(False, 0.0, 0.9, 64) is a
    assert eng._get_decode(False, 0.0, 0.9, 32) is not a


def test_engine_build_skips_resident_leaves(monkeypatch):
    """Params already resident on the target device must NOT round-trip
    through device_put — on tunnel backends each per-leaf call is an RPC
    and a 7B tree was measured costing minutes of engine build (engine.py
    _cast). Device-resident trees (the on-device synthetic-fill path)
    build with zero copies; host numpy trees still get pinned."""
    from videollama2_tpu.inference import engine as engine_mod

    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # jnp arrays on the default device — what materialize_fills produces
    resident = jax.tree.map(jnp.asarray, params)

    calls = []
    real_put = jax.device_put

    def counting_put(x, *a, **k):
        calls.append(1)
        return real_put(x, *a, **k)

    monkeypatch.setattr(engine_mod.jax, "device_put", counting_put)
    eng = Engine(cfg, resident, dtype=jnp.float32, max_len=64,
                 buckets=(32,), attn_impl="xla", decode_chunk=4)
    assert not calls, f"{len(calls)} device_put calls for resident params"

    out = eng.generate([[3, 5, 7]], gen=GenerationConfig(max_new_tokens=4),
                       eos_token_id=-1)
    assert len(out[0]) == 4


def test_engine_build_bounded_dispatches(monkeypatch):
    """Engine param prep must issue a BOUNDED number of device dispatches,
    not one per leaf: on the tunnel backend each dispatch is an RPC round
    trip, and the per-leaf version of the scale casts + qkv concats was
    measured costing 1.1-128 s of engine build for identical work depending
    on load (BASELINE.md round-5). Budget: <=1 batched cast program,
    <=1 fuse-concat program, 0 device_puts for a resident tree — and every
    untouched leaf passes through as the SAME array object (zero copies)."""
    from videollama2_tpu.inference import engine as engine_mod
    from videollama2_tpu.ops import quant as quant_mod

    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = dict(params,
                  llm=quant_mod.quantize_llm_params(params["llm"], bits=8))
    resident = jax.tree.map(jnp.asarray, params)

    puts, jit_execs, fuse_execs = [], [], []
    real_put, real_jit = jax.device_put, jax.jit
    real_fuse = quant_mod._fuse_concats

    def counting_put(x, *a, **k):
        puts.append(1)
        return real_put(x, *a, **k)

    def counting_jit(fn, *a, **k):
        compiled = real_jit(fn, *a, **k)

        def run(*ca, **ck):
            jit_execs.append(1)
            return compiled(*ca, **ck)
        return run

    monkeypatch.setattr(engine_mod.jax, "device_put", counting_put)
    monkeypatch.setattr(engine_mod.jax, "jit", counting_jit)
    monkeypatch.setattr(quant_mod, "_fuse_concats",
                        lambda g: (fuse_execs.append(1), real_fuse(g))[1])
    target = jax.devices()[0]
    out = engine_mod._prepare_single_chip(resident, jnp.bfloat16,
                                          fuse=True, target=target)
    assert not puts, f"{len(puts)} device_put calls for resident params"
    assert len(jit_execs) <= 1, f"{len(jit_execs)} cast dispatches"
    assert len(fuse_execs) <= 1, f"{len(fuse_execs)} fuse dispatches"

    # fp32 scales were cast by the batched program
    assert out["llm"]["layers"]["qkv"]["kernel_q8"]["scale"].dtype \
        == jnp.bfloat16
    # untouched int8 packs pass through as the same objects: zero copies
    assert out["llm"]["layers"]["o"]["kernel_q8"]["q"] \
        is resident["llm"]["layers"]["o"]["kernel_q8"]["q"]


def test_default_device_guard_accepts_platform_string(tiny):
    """jax.default_device also accepts a PLATFORM STRING ('cpu'); the
    engine guard must resolve it to the device it denotes instead of
    comparing str != Device (which raised spuriously when the default
    device WAS the engine's own target — e.g. any CPU-forced script
    wrapping generate() in `with jax.default_device('cpu')`)."""
    cfg, params = tiny
    eng = Engine(cfg, params, dtype=jnp.float32, max_len=64,
                 buckets=(32,), attn_impl="xla", decode_chunk=4)
    assert eng._target_device == jax.devices("cpu")[0]
    g = GenerationConfig(max_new_tokens=2)
    with jax.default_device("cpu"):
        out = eng.generate([[3, 4, 5]], gen=g, eos_token_id=-1)
    assert len(out[0]) == 2
    # a genuinely different default device must still raise
    other = jax.devices()[1]
    with jax.default_device(other):
        with pytest.raises(RuntimeError, match="default_device"):
            eng.generate([[3, 4, 5]], gen=g, eos_token_id=-1)
