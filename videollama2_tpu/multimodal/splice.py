"""Static-shape multimodal token splice (TPU-native redesign).

The reference splices visual embeddings into the text sequence with a Python
loop over dynamic-length segments, then re-pads the batch
(videollama2/model/videollama2_arch.py:161-263). Under XLA everything must be
static-shaped, so the splice is split in two:

  1. `plan_batch` (host, numpy): given tokenized prompts containing negative
     modal-token ids, lay out the final sequence per sample — for every output
     position record either the text token id or the PER-SAMPLE index of a
     visual token. Layout parity with the reference: each modal token expands
     in place to its `tokens_per_modal` embeddings and labels over visual
     spans become IGNORE_INDEX; samples are right-padded to a bucket.

  2. `compose` (device, jit): per-sample `take_along_axis` +
     `where(is_visual, ...)` — no dynamic shapes, fuses into the surrounding
     prefill, and stays correct under any batch reshape (grad-accum
     microbatching, dp sharding) because indices never cross samples.

Each sample carries exactly one vision-feature slot ([B, N, D] connector
output; zeros for text-only samples — the shape-uniform equivalent of the
reference's zero-width dummy concat, videollama2_arch.py:180-189). Samples
with multiple modal tags index further into their own slot stack (n-th tag
uses rows [n*tokens_per_modal, (n+1)*tokens_per_modal)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import IGNORE_INDEX, MODAL_INDEX_MAP

_MODAL_IDS = tuple(MODAL_INDEX_MAP.values())


@dataclass
class SplicePlan:
    """Static splice layout for one batch (all arrays [B, S] unless noted)."""
    text_ids: np.ndarray    # token id to embed at position (0 where visual)
    is_visual: np.ndarray   # bool: position holds a visual embedding
    vis_index: np.ndarray   # per-sample index into that sample's vis tokens
    labels: Optional[np.ndarray]  # IGNORE_INDEX-masked supervision targets
    valid_len: np.ndarray   # [B] true sequence lengths
    positions: np.ndarray   # [B, S] RoPE positions (= arange, pad included)

    @property
    def seq_len(self) -> int:
        return self.text_ids.shape[1]


def _count_for(tokens_per_modal, tok: int) -> int:
    if isinstance(tokens_per_modal, dict):
        return tokens_per_modal[tok]
    return tokens_per_modal


def spliced_length(input_ids: Sequence[int], tokens_per_modal) -> int:
    """tokens_per_modal: int, or {modal_id: count} for mixed AV prompts."""
    n = len(input_ids)
    for t in input_ids:
        if t in _MODAL_IDS:
            n += _count_for(tokens_per_modal, t) - 1
    return n


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if length <= b:
            return b
    raise ValueError(f"sequence length {length} exceeds largest bucket "
                     f"{max(buckets)}")


def plan_batch(batch_input_ids: List[Sequence[int]], tokens_per_modal,
               seq_len: int,
               batch_labels: Optional[List[Sequence[int]]] = None,
               truncate: bool = True) -> SplicePlan:
    """Lay out spliced sequences for a batch.

    batch_input_ids: per-sample token ids containing negative modal ids.
    tokens_per_modal: tokens emitted per modal tag — an int, or a
      {modal_id: count} dict for mixed prompts (e.g. <video> + <audio>;
      the per-sample token stack must then be concatenated in tag order).
    seq_len: static bucket length to right-pad/truncate to.
    """
    B = len(batch_input_ids)
    text_ids = np.zeros((B, seq_len), dtype=np.int32)
    is_visual = np.zeros((B, seq_len), dtype=bool)
    vis_index = np.zeros((B, seq_len), dtype=np.int32)
    labels_out = (np.full((B, seq_len), IGNORE_INDEX, dtype=np.int32)
                  if batch_labels is not None else None)
    valid_len = np.zeros((B,), dtype=np.int32)

    for b, ids in enumerate(batch_input_ids):
        lab = batch_labels[b] if batch_labels is not None else None
        pos = 0
        offset = 0  # running offset into this sample's modal-token stack
        for j, tok in enumerate(ids):
            if tok in _MODAL_IDS:
                count = _count_for(tokens_per_modal, tok)
                n = count
                if pos + n > seq_len:
                    if not truncate:
                        raise ValueError("spliced sequence exceeds bucket")
                    n = max(0, seq_len - pos)
                is_visual[b, pos:pos + n] = True
                vis_index[b, pos:pos + n] = offset + np.arange(n)
                pos += n
                offset += count
            else:
                if pos >= seq_len:
                    if not truncate:
                        raise ValueError("spliced sequence exceeds bucket")
                    break
                text_ids[b, pos] = tok
                if labels_out is not None:
                    labels_out[b, pos] = lab[j]
                pos += 1
        valid_len[b] = pos

    positions = np.broadcast_to(np.arange(seq_len, dtype=np.int32),
                                (B, seq_len)).copy()
    return SplicePlan(text_ids=text_ids, is_visual=is_visual,
                      vis_index=vis_index, labels=labels_out,
                      valid_len=valid_len, positions=positions)


def compose_embeds(text_emb: jax.Array, vis_tokens: jax.Array,
                   is_visual: jax.Array, vis_index: jax.Array) -> jax.Array:
    """Device-side splice over pre-computed text embeddings -> [B, S, D].

    text_emb: [B, S, D] already-embedded text tokens (use
    models.llm.embed_tokens, which handles int8-packed embedding tables).
    vis_tokens: [B, N, D] per-sample connector output (N = slots * tpm).
    """
    vis_emb = jnp.take_along_axis(
        vis_tokens.astype(text_emb.dtype), vis_index[..., None], axis=1)
    return jnp.where(is_visual[..., None], vis_emb, text_emb)


def compose(embed_weight: jax.Array, vis_tokens: jax.Array,
            text_ids: jax.Array, is_visual: jax.Array,
            vis_index: jax.Array) -> jax.Array:
    """Device-side splice -> [B, S, D] input embeddings.

    embed_weight: [V, D] LLM token embedding table (raw fp table only; for
    int8-packed tables embed the text first and call compose_embeds).
    vis_tokens: [B, N, D] per-sample connector output (N = slots * tpm).
    """
    text_emb = jnp.take(embed_weight, text_ids, axis=0)      # [B, S, D]
    return compose_embeds(text_emb, vis_tokens, is_visual, vis_index)
