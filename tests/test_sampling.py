"""Sampling + stopping-criteria tests."""

import numpy as np

import jax
import jax.numpy as jnp

from videollama2_tpu.inference import sampling


def test_greedy():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [5.0, 0.0, 0.0]])
    assert sampling.greedy(logits).tolist() == [1, 0]


def test_top_p_restricts_support():
    # one dominant token (p=0.97) with top_p=0.9 -> always sampled
    logits = jnp.log(jnp.asarray([[0.97, 0.01, 0.01, 0.01]]))
    for seed in range(5):
        tok = sampling.sample_top_p(jax.random.PRNGKey(seed), logits,
                                    temperature=1.0, top_p=0.9)
        assert int(tok[0]) == 0


def test_top_p_keeps_minimal_prefix():
    # probs 0.5, 0.3, 0.15, 0.05; top_p=0.75 keeps {0,1} (cumsum-excl < p)
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    seen = set()
    for seed in range(40):
        tok = sampling.sample_top_p(jax.random.PRNGKey(seed), logits,
                                    temperature=1.0, top_p=0.75)
        seen.add(int(tok[0]))
    assert seen <= {0, 1}
    assert 0 in seen and 1 in seen


def test_select_token_temperature_zero_is_greedy():
    logits = jnp.asarray([[0.0, 2.0, 1.0]])
    tok = sampling.select_token(jax.random.PRNGKey(0), logits,
                                do_sample=True, temperature=0.0, top_p=0.9)
    assert int(tok[0]) == 1


def test_keywords_stopper():
    from videollama2_tpu.utils.misc import KeywordsStopper

    class FakeTok:
        bos_token_id = 1

        def __call__(self, text):
            class R:
                pass
            r = R()
            r.input_ids = [1] + [ord(c) for c in text]
            return r

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(i) for i in ids if i > 31)

    stopper = KeywordsStopper(["</s>"], FakeTok())
    assert not stopper.should_stop([ord(c) for c in "hello"])
    assert stopper.should_stop([ord(c) for c in "hello</s>"])
