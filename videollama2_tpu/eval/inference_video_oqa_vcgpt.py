"""Video-ChatGPT benchmark inference: general (correctness/detail/context/
temporal) and consistency modes.

Parity: reference videollama2/eval/inference_video_oqa_vcgpt_general.py and
_consistency.py (:45-124) — the consistency benchmark asks two paraphrased
questions per video and records both predictions.
"""

from __future__ import annotations

import argparse
import json

from .common import ResultWriter, get_chunk, run_inference_loop
from .inference_video_oqa_activitynet import resolve_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["general", "consistency"],
                    default="general")
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
        questions = json.load(f)
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    writer = ResultWriter(args.answer_file, key="index")

    def infer(item):
        name = item.get("video_name") or item.get("video")
        video_path = resolve_video(args.video_folder, name)
        if video_path is None:
            return dict(video_name=name, missing=True)
        tensor = processor["video"](video_path)
        if args.mode == "general":
            q = item.get("question") or item.get("Q")
            pred = mm_infer(tensor, q, model, tokenizer, modal="video",
                            max_new_tokens=512)
            return dict(video_name=name, question=q,
                        answer=item.get("answer") or item.get("A"),
                        pred=pred)
        q1 = item.get("question_1") or item.get("Q1")
        q2 = item.get("question_2") or item.get("Q2")
        pred1 = mm_infer(tensor, q1, model, tokenizer, modal="video",
                         max_new_tokens=512)
        pred2 = mm_infer(tensor, q2, model, tokenizer, modal="video",
                         max_new_tokens=512)
        return dict(video_name=name, question=q1, question2=q2,
                    answer=item.get("answer") or item.get("A"),
                    pred=pred1, pred2=pred2)

    items = [dict(q, index=str(q.get("video_name", q.get("video", i))) +
                  f":{i}")
             for i, q in enumerate(questions)]
    run_inference_loop(items, infer, writer, desc=f"vcgpt-{args.mode}")
    writer.close()


if __name__ == "__main__":
    main()
