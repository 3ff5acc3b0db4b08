"""ActivityNet-QA / MSVD-QA open-ended QA inference.

Parity: reference videollama2/eval/inference_video_oqa_activitynet.py —
multi-extension video resolution (:42-66), chunked sharding, one answer per
question. The same script serves MSVD-QA (same file in the reference).
"""

from __future__ import annotations

import argparse
import json
import os

from .common import ResultWriter, get_chunk, run_inference_loop

VIDEO_EXTS = (".mp4", ".webm", ".avi", ".mov", ".mkv", ".gif")


def resolve_video(folder: str, name: str):
    for prefix in ("v_", ""):
        for ext in VIDEO_EXTS:
            p = os.path.join(folder, f"{prefix}{name}{ext}")
            if os.path.exists(p):
                return p
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--video-folder", required=True)
    ap.add_argument("--question-file", required=True)
    ap.add_argument("--answer-file", required=True)
    ap.add_argument("--gt-file", default=None,
                    help="optional ground-truth answers json")
    ap.add_argument("--num-chunks", type=int, default=1)
    ap.add_argument("--chunk-idx", type=int, default=0)
    args = ap.parse_args()

    from .. import mm_infer, model_init
    model, processor, tokenizer = model_init(args.model_path)

    with open(args.question_file) as f:
        questions = json.load(f)
    answers = None
    if args.gt_file:
        with open(args.gt_file) as f:
            answers = {str(a.get("question_id", i)): a
                       for i, a in enumerate(json.load(f))}

    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    writer = ResultWriter(args.answer_file, key="index")

    def infer(item):
        name = item.get("video_name") or item.get("video")
        qid = str(item.get("question_id", item.get("id")))
        video_path = resolve_video(args.video_folder, name)
        if video_path is None:
            return dict(question_id=qid, missing=True, pred="")
        tensor = processor["video"](video_path)
        pred = mm_infer(tensor, item["question"], model, tokenizer,
                        modal="video", max_new_tokens=256)
        rec = dict(question_id=qid, question=item["question"], pred=pred)
        if answers and qid in answers:
            rec["answer"] = answers[qid].get("answer")
        return rec

    items = [dict(item, index=str(item.get("question_id", i)))
             for i, item in enumerate(questions)]
    run_inference_loop(items, infer, writer, desc="oqa")
    writer.close()


if __name__ == "__main__":
    main()
