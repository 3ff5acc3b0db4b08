"""Token sampling: greedy / temperature / top-p (nucleus).

Generation-default parity: reference videollama2/__init__.py:93-96 — greedy
unless do_sample, temperature 0.2, top_p 0.9. HF semantics: temperature scales
logits before top-p filtering; top-p keeps the smallest prefix of the sorted
distribution with cumulative prob > p (the first token crossing p is kept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)


def sample_top_p(rng: jax.Array, logits: jax.Array, temperature: float,
                 top_p: float) -> jax.Array:
    """logits: [B, V] fp32 -> [B] sampled token ids."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    # HF TopPLogitsWarper: remove tokens whose prefix-exclusive cumsum >= p,
    # i.e. keep while cumsum - prob < p (always keeps the top token).
    keep_sorted = (cumsum - sorted_probs) < top_p
    # map back: a token survives if its prob >= smallest kept sorted prob
    num_keep = jnp.sum(keep_sorted, axis=-1)
    threshold = jnp.take_along_axis(sorted_probs, (num_keep - 1)[:, None],
                                    axis=-1)
    masked = jnp.where(probs >= threshold, logits, -jnp.inf)
    return jax.random.categorical(rng, masked, axis=-1)


def select_token(rng: jax.Array, logits: jax.Array, do_sample: bool,
                 temperature: float, top_p: float) -> jax.Array:
    if not do_sample or temperature == 0.0:
        return greedy(logits)
    return sample_top_p(rng, logits, temperature, top_p)
