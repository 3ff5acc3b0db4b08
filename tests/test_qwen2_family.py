"""Second model family end-to-end: videollama2_qwen2 (SigLIP tower, Qwen2
decoder with qkv bias, stc_connector_v35) through the engine, matching a
stepwise no-cache reference — mirrors the reference's Qwen2 wrapper
(videollama2/model/videollama2_qwen2.py)."""

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


def test_qwen2_engine_stepwise_parity():
    cfg = cfglib.tiny_model("videollama2_qwen2")
    assert cfg.vision.variant == "siglip"
    assert cfg.llm.qkv_bias
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    frames = rng.standard_normal((1, T, H, H, 3)).astype(np.float32)
    prompt = [3, 4, VIDEO_TOKEN_INDEX, 5]
    steps = 4

    eng = Engine(cfg, params, dtype=jnp.float32, max_len=128, buckets=(64,),
                 attn_impl="xla", decode_chunk=2)
    got = eng.generate([prompt], frames=frames,
                       gen=GenerationConfig(max_new_tokens=steps),
                       eos_token_id=-1)[0]

    tpm = cfg.tokens_per_video
    vis = vl2.encode_frames(params, cfg, jnp.asarray(frames),
                            attn_impl="xla")
    toks = list(prompt)
    for t in range(steps):
        plan = splice_lib.plan_batch([toks], tpm, 64)
        embeds = splice_lib.compose(params["llm"]["embed"]["weight"], vis,
                                    jnp.asarray(plan.text_ids),
                                    jnp.asarray(plan.is_visual),
                                    jnp.asarray(plan.vis_index))
        hidden, _ = llm_lib.forward(params["llm"], cfg.llm, embeds,
                                    jnp.asarray(plan.positions),
                                    jnp.asarray(plan.valid_len),
                                    attn_impl="xla")
        last = hidden[0, int(plan.valid_len[0]) - 1]
        nxt = int(jnp.argmax(
            llm_lib.lm_logits(params["llm"], cfg.llm, last[None]), -1)[0])
        assert nxt == got[t], t
        toks.append(nxt)
