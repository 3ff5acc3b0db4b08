"""Cross-video batched eval runner test (tiny model, synthetic media)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_run_batched(tmp_path_factory):
    import jax.numpy as jnp
    from make_tiny_checkpoint import build_checkpoint
    import videollama2_tpu
    from videollama2_tpu.eval.batch_runner import run_batched

    ckpt = build_checkpoint(str(tmp_path_factory.mktemp("ckpt")))
    model, processor, tokenizer = videollama2_tpu.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(128,),
        attn_impl="xla")

    rng = np.random.default_rng(0)
    T, H = model.config.num_frames, model.config.vision.image_size
    items = [{"vid": f"v{i}", "questions": [f"what is this {i} ?",
                                            f"why {i} ?"]}
             for i in range(3)]

    def load_media(item):
        return rng.standard_normal((T, H, H, 3)).astype(np.float32)

    def prompts_of(item):
        return [({"q": q}, q) for q in item["questions"]]

    results = []

    def on_result(item, meta, text):
        results.append((item["vid"], meta["q"], text))

    run_batched(model, tokenizer, items, load_media, prompts_of, on_result,
                batch_prompts=4, max_new_tokens=4)
    assert len(results) == 6
    vids = [v for v, _, _ in results]
    assert set(vids) == {"v0", "v1", "v2"}
    assert all(isinstance(t, str) for _, _, t in results)
