"""Vision tower parity vs HF CLIPVisionModel / SiglipVisionModel.

The reference towers return hidden_states[select_layer] with CLS dropped for
CLIP (encoder.py:31-39,103-109); verify our truncated-scan equivalent matches.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videollama2_tpu.core import config as cfglib
from videollama2_tpu.checkpoint.convert_hf import vision_params_from_state_dict
from videollama2_tpu.models import vit


def _hf_tower(cfg):
    import transformers
    common = dict(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act=cfg.hidden_act,
        attn_implementation="eager",
    )
    if cfg.variant == "clip":
        return transformers.CLIPVisionModel(
            transformers.CLIPVisionConfig(**common))
    return transformers.SiglipVisionModel(
        transformers.SiglipVisionConfig(**common))


@pytest.mark.parametrize("variant,select_layer", [("clip", -2),
                                                  ("siglip", -2),
                                                  ("clip", -1)])
def test_features_parity(variant, select_layer):
    torch.manual_seed(0)
    cfg = cfglib.tiny_vision(variant)
    import dataclasses
    cfg = dataclasses.replace(cfg, select_layer=select_layer)
    hf = _hf_tower(cfg).eval()
    params = vision_params_from_state_dict(hf.state_dict(), cfg,
                                           prefix="vision_model.")

    rng = np.random.default_rng(0)
    # [N, C, H, W] torch layout
    px = rng.standard_normal((3, 3, cfg.image_size, cfg.image_size),
                             dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(px), output_hidden_states=True)
    ref = out.hidden_states[select_layer].numpy()
    if variant == "clip":
        ref = ref[:, 1:]  # 'patch' feature select drops CLS (encoder.py:33-34)

    got = vit.features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)),
                       attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
