"""Checkpoint IO round-trips: HF export/import, projector-only saves."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.core.config import ConnectorConfig
from videollama2_tpu.checkpoint import convert_hf, orbax_io
from videollama2_tpu.models import connector as conn_lib


@pytest.mark.parametrize("ptype", ["stc_connector_v35", "mlp2x_gelu"])
def test_projector_hf_export_roundtrip(ptype, tmp_path):
    """export to torch mm_projector.bin -> reimport == original."""
    cfg = ConnectorConfig(projector_type=ptype, mm_hidden_size=24,
                          hidden_size=32, depth=2)
    params = conn_lib.init_params(jax.random.PRNGKey(0), cfg)
    bin_path = str(tmp_path / "mm_projector.bin")
    orbax_io.export_hf_projector_bin(bin_path, params, cfg)

    back = convert_hf.load_pretrain_adapter(str(tmp_path), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    # compare by path
    b_by_path = {jax.tree_util.keystr(p): l for p, l
                 in jax.tree_util.tree_leaves_with_path(back)}
    for p, leaf in flat_a:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(b_by_path[key]),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=key)


def test_projector_npz_roundtrip(tmp_path):
    cfg = ConnectorConfig(projector_type="stc_connector", mm_hidden_size=24,
                          hidden_size=32, depth=2)
    params = conn_lib.init_params(jax.random.PRNGKey(1), cfg)
    d = str(tmp_path / "adapter")
    orbax_io.save_projector_only(d, params)
    back = orbax_io.load_projector_only(d, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_model_config_from_hf_qwen2():
    cfg_json = {
        "model_type": "videollama2_qwen2", "hidden_size": 3584,
        "num_hidden_layers": 28, "num_attention_heads": 28,
        "num_key_value_heads": 4, "intermediate_size": 18944,
        "vocab_size": 152064, "rms_norm_eps": 1e-6, "rope_theta": 1e6,
        "mm_projector_type": "stc_connector_v35",
        "mm_vision_tower": "google/siglip-so400m-patch14-384",
        "mm_hidden_size": 1152, "num_frames": 16,
        "eos_token_id": [151645, 151643],
    }
    cfg = convert_hf.model_config_from_hf(cfg_json)
    assert cfg.llm.model_type == "qwen2"
    assert cfg.llm.qkv_bias is True
    assert cfg.vision.variant == "siglip"
    assert cfg.num_frames == 16
    assert cfg.llm.eos_token_id == 151645
    assert cfg.connector.projector_type == "stc_connector_v35"
    # 16 frames, 27x27 siglip patches, v35 (2,2,2) pad 0 -> 8*13*13
    assert cfg.tokens_per_video == 8 * 13 * 13
