"""Released-checkpoint key-manifest dry runs (VERDICT r3 #8).

The vendored manifests (tests/fixtures/manifests/*.json, built by
scripts/make_released_manifests.py from the published geometry) pin the full
safetensors key/shape layout of VideoLLaMA2-7B-16F and VideoLLaMA2.1-7B-AV
(reference model zoo, README.md:115-132). Each test feeds the converter a
zeros state-dict with exactly those keys and asserts:

  * every manifest key is consumed (or is a known intentionally-unread key),
    so a renamed/unmapped key fails loudly without weights;
  * the converted tree matches models.videollama2.init_params leaf-for-leaf
    in structure and shape at the released config.

np.zeros pages are virtual, so the 8B-param dry run costs seconds of
stacking, not 16 GB of RSS writes on entry.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollama2_tpu.checkpoint import convert_hf
from videollama2_tpu.core import config as cfglib
from videollama2_tpu.models import videollama2 as vl2

MANIFEST_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "manifests")


class RecordingDict(dict):
    def __init__(self, *a):
        super().__init__(*a)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _load(name):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        manifest = json.load(f)
    sd = RecordingDict(
        {k: np.zeros(s, np.float16) for k, s in manifest.items()})
    return manifest, sd


def _assert_tree_matches(params, cfg):
    ref = jax.eval_shape(
        lambda: vl2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    got_shapes = jax.tree.map(np.shape, params)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref)
    assert jax.tree.structure(got_shapes) == jax.tree.structure(ref_shapes), \
        "converted tree structure != init_params structure"
    for path_got, path_ref in zip(
            jax.tree_util.tree_leaves_with_path(got_shapes),
            jax.tree_util.tree_leaves_with_path(ref_shapes)):
        assert path_got[1] == path_ref[1], (
            f"shape drift at {jax.tree_util.keystr(path_got[0])}: "
            f"converted {path_got[1]} vs init_params {path_ref[1]}")


def test_videollama2_7b_16f_manifest():
    manifest, sd = _load("videollama2_7b_16f")
    cfg = cfglib.preset("videollama2_mistral").replace(num_frames=16)
    params = convert_hf.videollama2_params_from_state_dict(sd, cfg)
    unread = set(manifest) - sd.read
    assert not unread, f"manifest keys never consumed: {sorted(unread)[:10]}"
    _assert_tree_matches(params, cfg)


def test_videollama2_1_7b_av_manifest():
    manifest, sd = _load("videollama2_1_7b_av")
    cfg = cfglib.preset("videollama2_qwen2_av")
    params = convert_hf.videollama2_params_from_state_dict(sd, cfg)
    # intentionally-unread keys: the SigLIP attention-pooling head rides in
    # the released tower but the reference consumes hidden-state features
    # only (encoder.py select_layer/'patch'); BEATs serializes the shared
    # rel-bias embedding once per layer and the converter reads layer 0's
    allowed = {k for k in manifest
               if ".vision_tower.vision_model.head." in k} | {
        f"model.audio_tower.encoder.layers.{l}.self_attn."
        "relative_attention_bias.weight"
        for l in range(1, cfg.audio.num_layers)}
    unread = set(manifest) - sd.read - allowed
    assert not unread, f"manifest keys never consumed: {sorted(unread)[:10]}"
    _assert_tree_matches(params, cfg)


@pytest.mark.parametrize("name", ["videollama2_7b_16f",
                                  "videollama2_1_7b_av"])
def test_manifest_misnamed_key_fails(name):
    """Renaming any consumed weight key must raise (KeyError) — the manifest
    actually guards the converter's name mapping."""
    manifest, sd = _load(name)
    victim = "model.layers.0.self_attn.q_proj.weight"
    sd[victim + ".RENAMED"] = sd.pop(victim)
    cfg = (cfglib.preset("videollama2_mistral") if "16f" in name
           else cfglib.preset("videollama2_qwen2_av"))
    with pytest.raises(KeyError):
        convert_hf.videollama2_params_from_state_dict(sd, cfg)
