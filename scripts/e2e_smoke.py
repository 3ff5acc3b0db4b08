"""End-to-end smoke drive of the public API, exactly as a reference user:

    model, processor, tokenizer = videollama2_tpu.model_init(path)
    tensor = processor['video'](video_path)
    out = videollama2_tpu.mm_infer(tensor, question, model, tokenizer, 'video')

(reference quickstart README.md:300-337). Uses the tiny random checkpoint
from make_tiny_checkpoint.py and a synthesized GIF video.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", os.environ.get("E2E_PLATFORM", "cpu"))

import numpy as np
from PIL import Image


def main():
    import tempfile
    from scripts.make_tiny_checkpoint import build_checkpoint
    import videollama2_tpu

    tmp = tempfile.mkdtemp(prefix="vllama2_e2e_")
    ckpt = os.path.join(tmp, "ckpt")
    build_checkpoint(ckpt)
    print("checkpoint:", sorted(os.listdir(ckpt)))

    # synthesize a small video (GIF container path of the media layer)
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (64, 48, 3),
                                           dtype=np.uint8))
              for _ in range(12)]
    video_path = os.path.join(tmp, "clip.gif")
    frames[0].save(video_path, save_all=True, append_images=frames[1:],
                   duration=100)

    import jax.numpy as jnp
    model, processor, tokenizer = videollama2_tpu.model_init(
        ckpt, dtype=jnp.float32, max_len=256, buckets=(128,),
        attn_impl="xla")
    print("model_type:", model.model_type,
          "tokens_per_video:", model.config.tokens_per_video)

    tensor = processor["video"](video_path)
    print("video tensor:", tensor.shape, tensor.dtype)

    out = videollama2_tpu.mm_infer(tensor, "What happens in the video ?",
                                   model, tokenizer, modal="video",
                                   max_new_tokens=16)
    print("VIDEO ANSWER:", repr(out))

    img_path = os.path.join(tmp, "img.png")
    frames[0].save(img_path)
    img_tensor = processor["image"](img_path)
    out2 = videollama2_tpu.mm_infer(img_tensor, "Describe the image .",
                                    model, tokenizer, modal="image",
                                    max_new_tokens=16)
    print("IMAGE ANSWER:", repr(out2))

    out3 = videollama2_tpu.mm_infer(None, "Say yes or no .", model,
                                    tokenizer, modal="text",
                                    max_new_tokens=8)
    print("TEXT ANSWER:", repr(out3))

    from videollama2_tpu.inference.api import mm_infer_batch
    outs = mm_infer_batch(tensor, ["What happens ?", "Describe briefly ."],
                          model, tokenizer, modal="video", max_new_tokens=8)
    print("BATCH ANSWERS:", [repr(o) for o in outs])
    assert len(outs) == 2

    # I420 wire leg (media/wire.py — the serving default): same engine,
    # packed planar frames in, device-side unpack
    from videollama2_tpu.media import wire
    u8 = processor["video"](video_path)
    assert u8.dtype == np.uint8, u8.dtype  # production processors emit uint8
    packed = wire.rgb_to_i420(u8)
    out4 = videollama2_tpu.mm_infer(packed, "What happens in the video ?",
                                    model, tokenizer, modal="video",
                                    max_new_tokens=8)
    print("I420 ANSWER:", repr(out4))
    print("E2E OK")


if __name__ == "__main__":
    main()
