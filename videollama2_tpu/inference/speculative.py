"""Self-speculative decoding: prompt-lookup (n-gram) drafting + acceptance.

Beyond-reference capability (the reference decodes strictly one token per
HF-generate step). Decode on TPU is HBM-bandwidth-bound — every step reads
the full weight set for one token. Speculative decoding drafts K-1 likely
continuations host-side for free (n-gram lookup over the prompt + generated
text, after "Prompt Lookup Decoding"-style self-speculation — no draft
model), then verifies all K slots in ONE device pass (models/llm.py
decode_verify): each accepted draft is a token obtained without re-reading
the weights. Greedy acceptance makes the output token stream EXACTLY equal
to plain greedy decoding (tests/test_speculative.py pins parity), so this
is a pure latency optimization for repetitive/extractive generations
(subtitles, option restating, code, multi-turn chat).

Host side is numpy/python only — contexts are a few thousand ints.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def ngram_propose(context: Sequence[int], k: int, max_n: int = 3,
                  min_n: int = 1) -> List[int]:
    """Draft up to `k` continuation tokens by prompt lookup.

    Finds the most recent earlier occurrence of the longest suffix n-gram
    (n from max_n down to min_n) of `context` and returns the tokens that
    followed it. Returns fewer than k (possibly zero) tokens when no match
    exists or the match sits near the end.
    """
    L = len(context)
    if L < min_n + 1 or k <= 0:
        return []
    ctx = list(context)
    for n in range(min(max_n, L - 1), min_n - 1, -1):
        suffix = ctx[L - n:]
        # rightmost occurrence strictly before the suffix itself
        for start in range(L - n - 1, -1, -1):
            if ctx[start:start + n] == suffix:
                cont = ctx[start + n:start + n + k]
                if cont:
                    return cont
                break
    return []


def accept_drafts(drafts: Sequence[int], greedy: Sequence[int]
                  ) -> Tuple[List[int], int]:
    """Greedy acceptance for one verify round.

    Slot inputs were [t0, d1, .., d_{K-1}] and `greedy[i]` is the model's
    argmax continuation after slot i's prefix. Drafts are accepted while
    d_{i+1} == greedy[i]; the round always emits at least greedy[0] (the
    token a plain decode step would have produced).

    Returns (emitted tokens, number of accepted drafts). emitted has
    length accepted+1 and next round resumes from emitted[-1].
    """
    a = 0
    while a < len(drafts) and drafts[a] == greedy[a]:
        a += 1
    return list(greedy[:a + 1]), a
