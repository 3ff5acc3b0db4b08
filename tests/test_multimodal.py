"""Splice planning, tokenizer, and conversation-template parity tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from videollama2_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollama2_tpu.multimodal import splice
from videollama2_tpu.multimodal.conversation import conv_templates

REF_CONV = "/root/reference/videollama2/conversation.py"


def test_plan_batch_layout():
    ids0 = [5, 6, VIDEO_TOKEN_INDEX, 7]
    ids1 = [8, 9, 10]  # pure text: zeros frame slot, no visual positions
    labels0 = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7]
    labels1 = [8, 9, 10]
    plan = splice.plan_batch([ids0, ids1], tokens_per_modal=3, seq_len=8,
                             batch_labels=[labels0, labels1])
    # sample 0: [5, 6, v0, v1, v2, 7, pad, pad]
    assert plan.valid_len.tolist() == [6, 3]
    assert plan.text_ids[0, :2].tolist() == [5, 6]
    assert plan.is_visual[0].tolist() == [False, False, True, True, True,
                                          False, False, False]
    assert plan.vis_index[0, 2:5].tolist() == [0, 1, 2]
    assert plan.labels[0].tolist() == [IGNORE_INDEX] * 3 + [IGNORE_INDEX] * 2 \
        + [7] + [IGNORE_INDEX] * 2
    assert plan.is_visual[1].sum() == 0
    assert plan.labels[1, :3].tolist() == [8, 9, 10]


def test_plan_batch_two_modals_one_sample():
    ids = [1, VIDEO_TOKEN_INDEX, 2, -200, 3]
    plan = splice.plan_batch([ids], tokens_per_modal=2, seq_len=10)
    assert plan.valid_len[0] == 7
    assert plan.vis_index[0, 1:3].tolist() == [0, 1]   # slot 0
    assert plan.vis_index[0, 4:6].tolist() == [2, 3]   # slot 1
    assert plan.text_ids[0, 3] == 2


def test_compose():
    V, D = 16, 4
    embed = np.arange(V * D, dtype=np.float32).reshape(V, D)
    vis = -np.ones((1, 6, D), dtype=np.float32)  # [B, N, D] per-sample
    vis[0, :, 0] = np.arange(6)
    plan = splice.plan_batch([[1, VIDEO_TOKEN_INDEX, 2]], 3, 6)
    out = splice.compose(jnp.asarray(embed), jnp.asarray(vis),
                         jnp.asarray(plan.text_ids),
                         jnp.asarray(plan.is_visual),
                         jnp.asarray(plan.vis_index))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0, 0], embed[1])
    np.testing.assert_array_equal(out[0, 1], vis[0, 0])
    np.testing.assert_array_equal(out[0, 2], vis[0, 1])
    np.testing.assert_array_equal(out[0, 4], embed[2])


def _load_reference_conversation():
    with open(REF_CONV) as f:
        src = f.read()
    src = src.replace("from .constants import LOGDIR, NUM_FRAMES",
                      "LOGDIR='.'; NUM_FRAMES=8")
    # strip the PIL/media-dependent helpers by executing the whole module;
    # PIL is available, decord import is lazy inside methods.
    ns = {}
    exec(compile(src, REF_CONV, "exec"), ns)  # noqa: S102
    return ns


@pytest.mark.skipif(not os.path.exists(REF_CONV),
                    reason="reference not mounted")
def test_registry_keys_match_reference():
    """All 15 reference registry keys exist (conversation.py:480-503)."""
    ref_ns = _load_reference_conversation()
    assert set(conv_templates) == set(ref_ns["conv_templates"])


@pytest.mark.skipif(not os.path.exists(REF_CONV),
                    reason="reference not mounted")
@pytest.mark.parametrize("name", ["default", "plain", "v0", "v0_plain",
                                  "v0_mmtag", "llava_v0", "v1", "v1_mmtag",
                                  "llava_v1", "vicuna_v1", "llava_llama2",
                                  "llama2", "mistral", "qwen", "qwen_plain"])
def test_get_prompt_parity(name):
    ref_ns = _load_reference_conversation()
    ref_conv = ref_ns["conv_templates"][name].copy()
    conv = conv_templates[name].copy()
    msgs = [("<video>\nWhat happens?", 0), ("A cat jumps.", 1),
            ("Why?", 0), (None, 1)]
    for text, role in msgs:
        ref_conv.append_message(ref_conv.roles[role], text)
        conv.append_message(conv.roles[role], text)
    assert conv.get_prompt() == ref_conv.get_prompt()

    # tuple-form first message exercises the mmtag <Image> wrap path
    # (conversation.py:34-49)
    ref_conv = ref_ns["conv_templates"][name].copy()
    conv = conv_templates[name].copy()
    first = ("<image>\nDescribe.", None, None)
    ref_conv.append_message(ref_conv.roles[0], first)
    conv.append_message(conv.roles[0], first)
    ref_conv.append_message(ref_conv.roles[1], "It is a cat.")
    conv.append_message(conv.roles[1], "It is a cat.")
    assert conv.get_prompt() == ref_conv.get_prompt()


def test_tokenizer_multimodal_token():
    class FakeTok:
        def __call__(self, text, add_special_tokens=False):
            class R:
                pass
            r = R()
            r.input_ids = [ord(c) for c in text]
            return r

    from videollama2_tpu.multimodal.tokenizer import tokenizer_multimodal_token
    ids = tokenizer_multimodal_token("ab<video>cd", FakeTok(), "<video>")
    assert ids == [ord("a"), ord("b"), VIDEO_TOKEN_INDEX, ord("c"), ord("d")]
