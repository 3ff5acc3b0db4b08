"""MSVC multi-source video captioning inference.

Parity: reference videollama2/eval/inference_video_cap_msvc.py — one caption
per video, judged later for correctness/detailedness by gpt_judge.
"""

from __future__ import annotations

import argparse
import json
import os

from .common import ResultWriter, get_chunk, run_inference_loop

CAPTION_PROMPT = "Please describe the video in detail."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--video-folder", required=True)
    ap.add_argument("--question-file", required=True)
    ap.add_argument("--answer-file", required=True)
    ap.add_argument("--num-chunks", type=int, default=1)
    ap.add_argument("--chunk-idx", type=int, default=0)
    args = ap.parse_args()

    from .. import mm_infer, model_init
    model, processor, tokenizer = model_init(args.model_path)

    with open(args.question_file) as f:
        items_in = json.load(f)
    items_in = get_chunk(items_in, args.num_chunks, args.chunk_idx)
    writer = ResultWriter(args.answer_file, key="index")

    def infer(item):
        path = os.path.join(args.video_folder, item["video_path"]
                            if "video_path" in item else item["video"])
        tensor = processor["video"](path)
        pred = mm_infer(tensor, CAPTION_PROMPT, model, tokenizer,
                        modal="video", max_new_tokens=512)
        return dict(video=os.path.basename(path), pred=pred,
                    answer=item.get("captions", item.get("answer")))

    items = [dict(x, index=i) for i, x in enumerate(items_in)]
    run_inference_loop(items, infer, writer, desc="msvc")
    writer.close()


if __name__ == "__main__":
    main()
