"""Weight-only quantization tests (bitsandbytes replacement)."""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.models import llm as jllm
from videollama2_tpu.ops import quant


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 64, 32)).astype(np.float32))
    pack = quant.quantize_int8(w, axis=-2)
    deq = quant.dequantize_int8(pack, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    scale = np.asarray(pack["scale"]).max()
    assert err <= scale * 0.51  # half-ULP of the int8 grid


def test_int4_roundtrip_error():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    pack = quant.quantize_int4(w, axis=-2)
    assert pack["q4"].shape == (32, 32)  # packed along axis -2
    deq = quant.dequantize_int4(pack, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    scale = np.asarray(pack["scale"]).max()
    assert err <= scale * 0.51


def test_quantized_llm_forward_close():
    cfg = cfglib.tiny_llm("mistral")
    params = jllm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm_params(params, bits=8)
    deq = dict(params)
    deq = {**params, "layers": quant.materialize_quantized(
        qparams)["layers"]}

    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8))
    e = jllm.embed_tokens(params, jnp.asarray(ids))
    h_ref, _ = jllm.forward(params, cfg, e, jnp.arange(8)[None],
                            jnp.array([8]), attn_impl="xla")
    h_q, _ = jllm.forward(deq, cfg, e, jnp.arange(8)[None],
                          jnp.array([8]), attn_impl="xla")
    ref = np.asarray(jllm.lm_logits(params, cfg, h_ref))
    got = np.asarray(jllm.lm_logits(deq, cfg, h_q))
    # int8 weight error ~0.4%: logits track within loose tolerance
    assert np.abs(ref - got).max() < 0.5
    assert np.argmax(ref[0, -1]) == np.argmax(got[0, -1]) or \
        np.corrcoef(ref[0, -1], got[0, -1])[0, 1] > 0.99


def test_dense_q8_path_matches_materialized():
    from videollama2_tpu.ops.layers import dense
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    pack = quant.quantize_int8(w, axis=-2)
    ref = dense(x, {"kernel": quant.dequantize_int8(pack, jnp.float32)})
    got = dense(x, {"kernel_q8": pack})
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_matmul_q8_kernel_matches():
    from videollama2_tpu.ops.quant_matmul import matmul_q8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    pack = quant.quantize_int8(w, axis=-2)
    ref = x @ quant.dequantize_int8(pack, jnp.float32)
    got = matmul_q8(x, pack["q"], pack["scale"][0], block_f=128,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_dense_w8a8_accuracy():
    from videollama2_tpu.ops.layers import dense_w8a8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    pack = quant.quantize_int8(w, axis=-2)
    ref = np.asarray(x @ w)
    got = np.asarray(dense_w8a8(x, pack))
    # two int8 grids: ~1% relative error on well-conditioned random data
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_int4_dense_in_graph():
    """dense() consumes stripped {q4, scale} packs in-graph (QLoRA base):
    output must match explicit dequantization, including under jit+scan."""
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib

    cfg = cfglib.tiny_llm()
    params = llm_lib.init_params(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_llm_params(params, bits=4)
    mat = quant.materialize_quantized(q4, jnp.float32)

    B, S = 2, 8
    ids = np.arange(B * S).reshape(B, S) % cfg.vocab_size
    embeds = llm_lib.embed_tokens(q4, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.full((B,), S)

    h_q4, _ = jax.jit(lambda p: llm_lib.forward(
        p, cfg, embeds, pos, valid, attn_impl="xla"))(q4)
    h_ref, _ = llm_lib.forward(mat, cfg, embeds, pos, valid, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h_q4), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)


def test_w8a8_prefill_context_matches_dequant():
    """Inside ops.layers.w8a8_prefill, large-row int8-pack matmuls route
    through the s8xs8 dot (engine prefill path on TPU); full-model logits
    must track the dequantize-in-graph path closely."""
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.ops import layers as layers_ops

    cfg = cfglib.tiny_llm()
    params = llm_lib.init_params(jax.random.PRNGKey(0), cfg)
    q8 = quant.quantize_llm_params(params, bits=8)

    B, S = 2, 96  # rows > 64: the prefill branch
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    embeds = llm_lib.embed_tokens(q8, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.full((B,), S)

    h_ref, _ = llm_lib.forward(q8, cfg, embeds, pos, valid, attn_impl="xla")

    orig = layers_ops._on_tpu
    layers_ops._on_tpu = lambda: True  # dense_w8a8 is plain XLA, runs on CPU
    try:
        with layers_ops.w8a8_prefill(True):
            h_w8, _ = llm_lib.forward(q8, cfg, embeds, pos, valid,
                                      attn_impl="xla")
    finally:
        layers_ops._on_tpu = orig

    ref = np.asarray(h_ref, np.float64).ravel()
    got = np.asarray(h_w8, np.float64).ravel()
    corr = np.corrcoef(ref, got)[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_dense_w4a8_weight_recovery_exact():
    """The folded-nibble planes must unpack to EXACTLY the int4 grid the
    pack was built from (offset-binary low nibble, two's-complement high),
    i.e. dense_w4a8's weight side loses nothing vs dequantization."""
    from videollama2_tpu.ops.layers import dense_w4a8
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    pack = quant.quantize_int4(w, axis=-2)
    wref = np.asarray(quant.dequantize_int4(pack, jnp.float32))
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    got = np.asarray(dense_w4a8(
        x, {"q4": pack["q4"], "scale": pack["scale"]}))
    ref = np.asarray(x) @ wref
    # residual is the activation 8-bit rounding only
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9995


def test_w4a8_prefill_context_matches_dequant():
    """Inside ops.layers.w8a8_prefill, large-row int4-pack matmuls route
    through the s8xs8 dot too (W4A8 — the load_4bit serving prefill on
    TPU); full-model logits must track the dequantize-in-graph path."""
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.ops import layers as layers_ops

    cfg = cfglib.tiny_llm()
    params = llm_lib.init_params(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_llm_params(params, bits=4)

    B, S = 2, 96  # rows > 64: the prefill branch
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    embeds = llm_lib.embed_tokens(q4, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    valid = jnp.full((B,), S)

    h_ref, _ = llm_lib.forward(q4, cfg, embeds, pos, valid, attn_impl="xla")

    orig = layers_ops._on_tpu
    layers_ops._on_tpu = lambda: True  # dense_w4a8 is plain XLA, runs on CPU
    try:
        with layers_ops.w8a8_prefill(True):
            h_w4, _ = llm_lib.forward(q4, cfg, embeds, pos, valid,
                                      attn_impl="xla")
    finally:
        layers_ops._on_tpu = orig
    ref = np.asarray(h_ref, np.float64).ravel()
    got = np.asarray(h_w4, np.float64).ravel()
    corr = np.corrcoef(ref, got)[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_int8_embed_multimodal_prefill():
    """Regression: quantize_llm_params(include_embed=True) must not break
    multimodal prefill (round-2 verdict: every vision/audio prefill indexed
    params['llm']['embed']['weight'] directly and raised KeyError on the
    int8 embed pack — the advertised qwen2 bench config)."""
    import jax
    from videollama2_tpu.constants import VIDEO_TOKEN_INDEX
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.inference.engine import Engine, GenerationConfig
    from videollama2_tpu.models import videollama2 as vl2

    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["llm"] = quant.quantize_llm_params(
        params["llm"], bits=8, include_head=True, include_embed=True)
    assert "weight_q8" in qparams["llm"]["embed"]

    T, H = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((2, T, H, H, 3)).astype(np.float32)
    prompts = [[3, VIDEO_TOKEN_INDEX, 5], [7, VIDEO_TOKEN_INDEX, 8, 9]]
    eng = Engine(cfg, qparams, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=4)
    gen = GenerationConfig(max_new_tokens=4)
    # vision mode (per-sample frames)
    out = eng.generate(prompts, frames=frames, gen=gen, eos_token_id=-1)
    assert all(len(o) == 4 for o in out)
    # vision_shared mode (one video broadcast to the batch)
    out_s = eng.generate(prompts, frames=frames[:1], gen=gen,
                         eos_token_id=-1, share_media=True)
    assert all(len(o) == 4 for o in out_s)
    # image mode (single-frame broadcast)
    out_i = eng.generate(prompts, frames=frames[:, :1], gen=gen,
                         eos_token_id=-1, image_mode=True)
    assert all(len(o) == 4 for o in out_i)
    # vision_grouped mode (G videos feeding B prompts)
    out_g = eng.generate(prompts, frames=frames, gen=gen, eos_token_id=-1,
                         media_group=[0, 1])
    assert out_g == out
    # text-only path still works with the quantized embed
    out_t = eng.generate([[3, 4, 5]], gen=gen, eos_token_id=-1)
    assert len(out_t[0]) == 4

    # int8-embed output must track the embed-fp engine (same int8 layer
    # weights, only the embedding rounds): greedy tokens match on a tiny
    # model whose logit gaps far exceed the 0.4% embed rounding error
    qparams_fp_embed = dict(params)
    qparams_fp_embed["llm"] = quant.quantize_llm_params(
        params["llm"], bits=8, include_head=True, include_embed=False)
    eng_fp = Engine(cfg, qparams_fp_embed, dtype=jnp.float32, max_len=128,
                    buckets=(64,), attn_impl="xla", decode_chunk=4)
    ref = eng_fp.generate(prompts, frames=frames, gen=gen, eos_token_id=-1)
    assert out == ref


def test_embed_and_lmhead_q8_paths():
    """int8 embedding gather + int8 lm_head (BnB quantizes every Linear)
    must track the fp path closely through embed_tokens/lm_logits."""
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import llm as llm_lib

    cfg = cfglib.tiny_llm()
    params = llm_lib.init_params(jax.random.PRNGKey(0), cfg)
    q = quant.quantize_llm_params(params, bits=8, include_head=True,
                                  include_embed=True)
    assert "kernel_q8" in q["lm_head"] and "weight_q8" in q["embed"]

    ids = jnp.asarray([[1, 5, 9], [2, 0, 3]])
    e_fp = llm_lib.embed_tokens(params, ids)
    e_q8 = llm_lib.embed_tokens(q, ids)
    np.testing.assert_allclose(np.asarray(e_q8), np.asarray(e_fp),
                               rtol=0.02, atol=0.01)

    h = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.hidden_size)) * 0.1
    lo_fp = llm_lib.lm_logits(params, cfg, h)
    lo_q8 = llm_lib.lm_logits(q, cfg, h)
    ref = np.asarray(lo_fp).ravel()
    got = np.asarray(lo_q8).ravel()
    assert np.corrcoef(ref, got)[0, 1] > 0.999


def test_quantized_vision_tower_close():
    """int8 tower (quantize_vision_params) ~ bf16 tower features; the
    fused-qkv concat path must handle kernel_q8 packs (models/vit
    _fuse_qkv_layers). Reference parity: bitsandbytes load_8bit wraps the
    tower's linears too (model/__init__.py:59-69)."""
    from videollama2_tpu.models import vit as jvit

    cfg = cfglib.tiny_model().vision
    rng = jax.random.PRNGKey(0)
    params = jvit.init_params(rng, cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.image_size, cfg.image_size, 3),
                          jnp.float32)
    ref = jvit.features(params, cfg, x)
    qparams = quant.quantize_vision_params(params)
    got = jvit.features(qparams, cfg, x)
    assert got.shape == ref.shape
    # int8 per-channel error compounds over layers; demand close-but-not-
    # equal (catches wiring bugs, not quantization noise)
    err = np.abs(np.asarray(got) - np.asarray(ref)).mean()
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err / scale < 0.15, (err, scale)
    # W8A8 context path traces and runs too
    from videollama2_tpu.ops import layers as layers_ops
    with layers_ops.w8a8_prefill(True):
        got2 = jvit.features(qparams, cfg, x)
    assert np.isfinite(np.asarray(got2)).all()


def test_small_row_quant_path_gated_on_inference_context():
    """rows<=64 matmuls on a quantized base must stay DIFFERENTIABLE
    outside ops.layers.quant_inference: the W8A8/W4A8 activation round()
    has zero gradient, so a small-batch QLoRA training forward (B*S<=64)
    hitting it would silently zero dgrad through the frozen base (ADVICE
    r4). Inside the context (engine decode/verify jits) the fast path is
    taken; outside, the dequant path's dgrad is exact and nonzero."""
    from videollama2_tpu.ops import layers as layers_ops

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)  # rows=4
    for pack in (quant.quantize_int8(w, axis=-2),
                 None):
        p = ({"kernel_q8": pack} if pack is not None
             else {"kernel_q4": quant.quantize_int4(w, axis=-2)})

        orig = layers_ops._on_tpu
        layers_ops._on_tpu = lambda: True
        try:
            # training trace (no context): dgrad flows through the base
            g = jax.grad(lambda x: layers_ops.dense(x, p).sum())(x)
            assert np.abs(np.asarray(g)).max() > 0, "dgrad zeroed"
            # the fast path engages only inside the inference context;
            # it computes the same matmul up to activation-quant noise
            y_ref = layers_ops.dense(x, p)
            with layers_ops.quant_inference(True):
                y_fast = layers_ops.dense(x, p)
            err = np.abs(np.asarray(y_fast) - np.asarray(y_ref)).mean()
            scale = np.abs(np.asarray(y_ref)).mean() + 1e-9
            assert err / scale < 0.05, (err, scale)
        finally:
            layers_ops._on_tpu = orig


def test_quant_contexts_are_thread_local():
    """The quant-routing contexts must not leak across threads: the serving
    stack traces engine programs from ThreadingHTTPServer handler threads
    and the DynamicBatcher's collector thread concurrently, so a module-
    global flag would let one thread's __exit__ flip routing mid-trace of
    another thread's program and permanently cache a mixed-path executable
    (trace-time == caller-thread-time: the contexts wrap INSIDE the jitted
    body, inference/engine._get_prefill)."""
    import threading

    from videollama2_tpu.ops import layers as layers_ops

    entered = threading.Event()
    release = threading.Event()
    seen = {}

    def holder():
        with layers_ops.quant_inference(True), layers_ops.w8a8_prefill(True):
            entered.set()
            release.wait(timeout=10)
            # this thread still sees its own flags after the main thread's
            # context cycled
            seen["inner"] = (layers_ops._quant_inference_enabled(),
                             layers_ops._w8a8_large_rows_enabled())

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert entered.wait(timeout=10)
        # main thread: unaffected by the holder thread's active contexts
        assert not layers_ops._quant_inference_enabled()
        assert not layers_ops._w8a8_large_rows_enabled()
        # cycle the contexts here; the holder's state must survive it
        with layers_ops.quant_inference(True):
            pass
    finally:
        release.set()
        t.join(timeout=10)
    assert seen["inner"] == (True, True)


def test_force_native_quant_routes_off_tpu():
    """ops.layers.force_native_quant must engage the W8A8/W4A8 s8-dot
    paths on a non-TPU backend (the quant-accuracy harness depends on it:
    without the force, its "int8+w8a8" variant silently re-measures the
    dequant path — bit-identical to plain int8 — because dense() is
    backend-gated)."""
    from videollama2_tpu.ops import layers as layers_ops

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    # non-multiple-of-quant-step activations so the round() is visible
    x = jnp.asarray(rng.standard_normal((4, 32)) * 1.7, jnp.float32)
    p = {"kernel_q8": quant.quantize_int8(w, axis=-2)}

    assert not layers_ops._on_tpu()  # the premise of this test
    y_dequant = layers_ops.dense(x, p)
    with layers_ops.quant_inference(True):
        # context alone (no force, off-TPU): still the dequant path
        y_gated = layers_ops.dense(x, p)
    np.testing.assert_array_equal(np.asarray(y_dequant),
                                  np.asarray(y_gated))
    with layers_ops.quant_inference(True), \
            layers_ops.force_native_quant(True):
        y_forced = layers_ops.dense(x, p)
    ref = np.asarray(layers_ops.dense_w8a8(x, p["kernel_q8"]))
    np.testing.assert_array_equal(np.asarray(y_forced), ref)
    # the activation round makes the s8 path bit-different from dequant
    assert np.abs(ref - np.asarray(y_dequant)).max() > 0
    # and the flag restores on exit
    assert not layers_ops._force_native_enabled()
