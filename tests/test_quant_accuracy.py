"""Quantization-accuracy gates (eval/quant_accuracy harness).

Pins that on the HF-converted tiny parity fixture, int8 weights, W8A8
prefill and the int8 KV cache keep teacher-forced top-1 agreement with the
full-precision reference at >= 95% (measured: ~99% / KL <= 1e-6 — random
weights produce near-uniform logits, the WORST case for agreement, so the
bound is conservative). The W8A8 variant runs the REAL activation-round +
s8xs8 math even on this CPU host (ops/layers.force_native_quant — without
it the backend-gated fast path would be inert and the row would silently
re-measure plain int8). int4 is reported, not gated: its measured ~84%
tiny-fixture agreement is the documented trade of the load_4bit serving
configuration (DESIGN.md), mirroring bitsandbytes NF4's known drift
(reference model/__init__.py:59-69 inherits it silently; here it is a
number)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.checkpoint.convert_hf import llm_params_from_state_dict
from videollama2_tpu.eval import quant_accuracy as qa
from tests.test_llm_parity import _hf_model


@pytest.fixture(scope="module")
def measured():
    torch.manual_seed(0)
    cfg = cfglib.tiny_llm("mistral")
    hf = _hf_model("mistral", cfg).eval()
    params = llm_params_from_state_dict(hf.state_dict(), cfg)
    rng = np.random.default_rng(0)
    prompts = [np.concatenate([[1], rng.integers(4, cfg.vocab_size - 1,
                                                 rng.integers(8, 24))])
               for _ in range(3)]
    return qa.measure(params, cfg, prompts, steps=8, bucket=48,
                      max_len=128, dtype=jnp.float32)


def test_int8_top1_agreement_gate(measured):
    assert measured["int8"]["top1_agreement"] >= 0.95, measured["int8"]
    assert measured["int8"]["kl"] < 1e-4, measured["int8"]


def test_w8a8_prefill_agreement_gate(measured):
    assert measured["int8+w8a8"]["top1_agreement"] >= 0.95


def test_kv8_agreement_gate(measured):
    """The int8 KV cache must be accuracy-free at the top-1 level (measured
    KL ~3e-8 — an order below weight quantization)."""
    assert measured["kv8"]["top1_agreement"] >= 0.95, measured["kv8"]
    assert measured["kv8"]["kl"] < 1e-5, measured["kv8"]
    assert measured["int8+kv8"]["top1_agreement"] >= 0.95


def test_int4_reported_not_gated(measured):
    # int4 must still be in the same distribution family (finite KL,
    # nonzero agreement), but its drift is a documented trade
    m = measured["int4"]
    assert np.isfinite(m["kl"]) and m["top1_agreement"] > 0.5, m
