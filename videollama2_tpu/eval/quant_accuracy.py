"""Quantization-accuracy measurement: logit drift and answer flips.

The reference loads quantized weights through bitsandbytes and inherits its
accuracy contract silently (videollama2/model/__init__.py:59-69 — load_8bit/
load_4bit flags, no accuracy evaluation anywhere in the repo). Here the trade
is measured: for each quantized configuration (int8 / int4 weights, W8A8
prefill, int8 KV cache, and combinations) against the full-precision
reference on the SAME model:

  * teacher-forced decode KL(ref || quant) per step (the distribution-level
    drift, independent of sampling);
  * teacher-forced top-1 agreement (would greedy pick the same token given
    the same context?);
  * free-running greedy exact-match + first-divergence step (the
    user-visible "answer flip" metric).

Works on any param tree the models/llm forward accepts — the tiny random
HF-converted fixtures in CI, or a real converted checkpoint via
scripts/quant_accuracy.py --model-path once weights are available offline.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..models import llm as llm_lib
from ..ops import layers as layers_ops
from ..ops import quant as quant_lib


@dataclasses.dataclass
class QuantVariant:
    """One quantization configuration to compare against the fp reference."""
    name: str
    weight_bits: int = 0          # 0 = full precision weights
    kv_bits: int = 16
    w8a8_prefill: bool = False


DEFAULT_VARIANTS = (
    QuantVariant("int8", weight_bits=8),
    QuantVariant("int4", weight_bits=4),
    QuantVariant("int8+w8a8", weight_bits=8, w8a8_prefill=True),
    QuantVariant("kv8", kv_bits=8),
    QuantVariant("int8+kv8", weight_bits=8, kv_bits=8),
    QuantVariant("int4+kv8", weight_bits=4, kv_bits=8),
)


def _prep_params(params: dict, variant: QuantVariant) -> dict:
    if variant.weight_bits:
        return quant_lib.quantize_llm_params(params,
                                             bits=variant.weight_bits)
    return params


def _make_fns(cfg: LLMConfig, bucket: int, max_len: int, kv_bits: int,
              w8a8: bool, dtype):
    """Jitted prefill / decode-step closures (compiled once per variant;
    eager per-op dispatch on the 1-core CI host is ~50x slower)."""
    import jax as _jax

    @_jax.jit
    def prefill_fn(params, ids, valid):
        # force_native_quant: off-TPU (the CI/parity host) the W8A8 gate in
        # ops/layers.dense is backend-gated, so without the force the
        # "int8+w8a8" variant would silently measure the dequant path —
        # identical math to plain "int8". The force makes the harness
        # execute the same activation-round + s8xs8 dot the TPU serves.
        with layers_ops.quant_inference(True), \
                layers_ops.w8a8_prefill(w8a8), \
                layers_ops.force_native_quant(w8a8):
            cache = llm_lib.init_cache(cfg, 1, max_len, dtype,
                                       kv_bits=kv_bits)
            embeds = llm_lib.embed_tokens(params, ids, dtype=dtype)
            positions = jnp.broadcast_to(jnp.arange(bucket), (1, bucket))
            last, cache = llm_lib.prefill(params, cfg, embeds, positions,
                                          valid, cache)
            return llm_lib.lm_logits(params, cfg, last), cache

    @_jax.jit
    def step_fn(params, feed, cache, valid, stepi):
        # force here too: on TPU, decode-shaped dense calls on quantized
        # packs (rows<=64 under quant_inference — e.g. lm_head) take the
        # W8A8 activation-round path, so the harness decodes with the
        # same math. No-op for unquantized trees (no packs to route).
        with layers_ops.quant_inference(True), \
                layers_ops.force_native_quant(True):
            te = llm_lib.embed_tokens(params, feed[None, None], dtype=dtype)
            return llm_lib.decode_step(params, cfg, te, cache, valid,
                                       bucket, stepi)

    return prefill_fn, step_fn


def _decode_logits(params: dict, fns, prompt: np.ndarray,
                   forced: Optional[np.ndarray], steps: int, bucket: int):
    """Prefill `prompt` then decode `steps` tokens.

    forced=None: free-running greedy (each step feeds its own argmax).
    forced=[steps] ids: teacher forcing — step i feeds forced[i-1] (the
    reference's trajectory), so per-step logits are comparable across
    configurations.
    Returns (logits [steps, V] fp32, tokens [steps])."""
    prefill_fn, step_fn = fns
    S = len(prompt)
    ids = np.zeros((1, bucket), np.int32)
    ids[0, :S] = prompt
    valid = jnp.asarray([S], jnp.int32)
    logits, cache = prefill_fn(params, jnp.asarray(ids), valid)

    out_logits: List[np.ndarray] = [np.asarray(logits[0], np.float32)]
    tok = int(np.argmax(out_logits[0]))
    tokens = [tok]
    for i in range(1, steps):
        feed = int(forced[i - 1]) if forced is not None else tokens[-1]
        logits, cache = step_fn(params, jnp.int32(feed), cache, valid,
                                jnp.int32(i - 1))
        out_logits.append(np.asarray(logits[0], np.float32))
        tokens.append(int(np.argmax(out_logits[-1])))
    return np.stack(out_logits), np.asarray(tokens)


def _kl(ref_logits: np.ndarray, q_logits: np.ndarray) -> float:
    """Mean KL(ref || quant) over steps, computed in float64 log-space."""
    def logsoft(x):
        x = x.astype(np.float64)
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))
    lr, lq = logsoft(ref_logits), logsoft(q_logits)
    p = np.exp(lr)
    return float((p * (lr - lq)).sum(-1).mean())


def measure(params: dict, cfg: LLMConfig,
            prompts: Sequence[np.ndarray],
            variants: Sequence[QuantVariant] = DEFAULT_VARIANTS,
            steps: int = 16, bucket: int = 64, max_len: int = 256,
            dtype=jnp.float32) -> Dict[str, dict]:
    """Run the full variant matrix. Returns {variant: metrics} where
    metrics = {kl, top1_agreement, greedy_exact_match, first_divergence}."""
    # reference trajectories (full precision, bf16/fp32 cache)
    ref_fns = _make_fns(cfg, bucket, max_len, 16, False, dtype)
    refs = []
    for p in prompts:
        lo, toks = _decode_logits(params, ref_fns, p, None, steps, bucket)
        refs.append((lo, toks))

    results: Dict[str, dict] = {}
    for variant in variants:
        vparams = _prep_params(params, variant)
        fns = _make_fns(cfg, bucket, max_len, variant.kv_bits,
                        variant.w8a8_prefill, dtype)
        kls, agree, total = [], 0, 0
        exact, first_div = 0, []
        for p, (ref_lo, ref_toks) in zip(prompts, refs):
            # teacher-forced on the reference trajectory
            q_lo, q_toks = _decode_logits(vparams, fns, p, ref_toks, steps,
                                          bucket)
            kls.append(_kl(ref_lo, q_lo))
            agree += int((q_toks == ref_toks).sum())
            total += steps
            # free-running greedy (the user-visible answer)
            _, free_toks = _decode_logits(vparams, fns, p, None, steps,
                                          bucket)
            same = free_toks == ref_toks
            exact += int(same.all())
            first_div.append(int(np.argmax(~same)) if not same.all()
                             else steps)
        results[variant.name] = {
            "kl": float(np.mean(kls)),
            "top1_agreement": agree / total,
            "greedy_exact_match": exact / len(prompts),
            "mean_first_divergence": float(np.mean(first_div)),
            "steps": steps,
            "prompts": len(prompts),
        }
    return results


def format_table(results: Dict[str, dict]) -> str:
    lines = [f"{'variant':<12} {'KL(ref||q)':>12} {'top-1 agree':>12} "
             f"{'greedy exact':>13} {'1st divergence':>15}"]
    for name, m in results.items():
        lines.append(
            f"{name:<12} {m['kl']:>12.3e} {m['top1_agreement']:>11.1%} "
            f"{m['greedy_exact_match']:>12.1%} "
            f"{m['mean_first_divergence']:>12.1f}/{m['steps']}")
    return "\n".join(lines)
