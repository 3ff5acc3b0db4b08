"""Video-MME multiple-choice QA inference.

Parity: reference videollama2/eval/inference_video_mcqa_videomme.py — parquet
question loading, per-video frame sampling with optional subtitle alignment
(subtitles windowed to the sampled frames), chunked sharding across workers,
answer-letter extraction with default-'C' fallback on failure.

Usage:
  python -m videollama2_tpu.eval.inference_video_mcqa_videomme \
    --model-path CKPT --video-folder DIR --question-file q.parquet \
    --subtitle-folder SUBS --answer-file out.jsonl \
    --num-chunks 1 --chunk-idx 0
"""

from __future__ import annotations

import argparse
import json
import os


from ..media import sampler as sampler_lib
from .common import ResultWriter, extract_choice_letter, get_chunk, \
    run_inference_loop


def load_questions(question_file: str):
    if question_file.endswith(".parquet"):
        import pandas as pd
        df = pd.read_parquet(question_file)
        return df.to_dict("records")
    with open(question_file) as f:
        return json.load(f)


def load_subtitles(sub_path: str, frame_indices, fps: float) -> str:
    """Subtitle lines overlapping the sampled frames
    (inference_video_mcqa_videomme.py:100-119 equivalent). pysubs2 is not in
    the image; we parse SRT directly."""
    if not os.path.exists(sub_path):
        return ""
    import re as _re
    with open(sub_path, errors="ignore") as f:
        text = f.read()
    entries = []
    for block in _re.split(r"\n\s*\n", text.strip()):
        lines = block.strip().splitlines()
        if len(lines) >= 2 and "-->" in lines[1 if lines[0].isdigit()
                                              else 0]:
            ts_line = lines[1] if lines[0].isdigit() else lines[0]
            body = lines[2 if lines[0].isdigit() else 1:]
            m = _re.match(
                r"(\d+):(\d+):(\d+)[,.](\d+)\s*-->\s*"
                r"(\d+):(\d+):(\d+)[,.](\d+)", ts_line)
            if not m:
                continue
            g = [int(x) for x in m.groups()]
            start = g[0] * 3600 + g[1] * 60 + g[2] + g[3] / 1000
            end = g[4] * 3600 + g[5] * 60 + g[6] + g[7] / 1000
            entries.append((start, end, " ".join(body)))
    frame_times = set(int(i) for i in frame_indices)
    picked = []
    for start, end, body in entries:
        s_f, e_f = int(start * fps), int(end * fps)
        if any(s_f <= fi <= e_f for fi in frame_times):
            picked.append(body)
    return "\n".join(picked)


SUB_PROMPT = ("This video's subtitles are listed below:\n{subtitle}\n"
              "Select the best answer to the following multiple-choice "
              "question based on the video. Respond with only the letter "
              "(A, B, C, or D) of the correct option.\n")
NOSUB_PROMPT = ("Select the best answer to the following multiple-choice "
                "question based on the video. Respond with only the letter "
                "(A, B, C, or D) of the correct option.\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--video-folder", required=True)
    ap.add_argument("--subtitle-folder", default=None)
    ap.add_argument("--question-file", required=True)
    ap.add_argument("--answer-file", required=True)
    ap.add_argument("--num-chunks", type=int, default=1)
    ap.add_argument("--chunk-idx", type=int, default=0)
    ap.add_argument("--num-frames", type=int, default=None)
    args = ap.parse_args()

    from .. import model_init
    model, processor, tokenizer = model_init(args.model_path)
    num_frames = args.num_frames or model.config.num_frames

    questions = load_questions(args.question_file)
    # group per video (the reference batches the ~3 questions per video)
    by_video = {}
    for q in questions:
        by_video.setdefault(q["videoID"] if "videoID" in q
                            else q["video_id"], []).append(q)
    video_ids = get_chunk(sorted(by_video), args.num_chunks, args.chunk_idx)

    writer = ResultWriter(args.answer_file, key="index")

    def infer_video(vid_item):
        vid = vid_item["vid"]
        qs = by_video[vid]
        video_path = None
        for ext in (".mp4", ".webm", ".avi", ".mov", ".mkv"):
            p = os.path.join(args.video_folder, vid + ext)
            if os.path.exists(p):
                video_path = p
                break
        records = []
        if video_path is None:
            # missing video: default answers (reference :94-98,253-261)
            for q in qs:
                records.append(dict(question_id=q.get("question_id"),
                                    missing=True, response="C"))
            return {"vid": vid, "questions": records}

        tensor = processor["video"](video_path)
        # batch all (sub-mode x question) prompts for this video: the video
        # encodes once and its tokens broadcast across the batch
        prompts, metas = [], []
        for with_sub in ([False, True] if args.subtitle_folder else [False]):
            prompt = NOSUB_PROMPT
            if with_sub:
                from ..media.video_reader import VideoReader
                try:
                    vr = VideoReader(video_path)
                    idx = sampler_lib.sample_indices(
                        len(vr), vr.get_avg_fps(), num_frames)
                    subs = load_subtitles(
                        os.path.join(args.subtitle_folder, vid + ".srt"),
                        idx, vr.get_avg_fps())
                    vr.close()
                except Exception:
                    subs = ""
                prompt = SUB_PROMPT.format(subtitle=subs)
            for q in qs:
                options = list(q.get("options", []))
                prompts.append(prompt + q["question"] + "\n"
                               + "\n".join(options))
                metas.append((q, with_sub, options))
        try:
            from ..inference.api import mm_infer_batch
            resps = mm_infer_batch(tensor, prompts, model, tokenizer,
                                   modal="video", max_new_tokens=128)
        except Exception:
            resps = ["C"] * len(prompts)
        for resp, (q, with_sub, options) in zip(resps, metas):
            records.append(dict(
                question_id=q.get("question_id"), sub=with_sub,
                response=resp,
                letter=extract_choice_letter(resp, options)))
        return {"vid": vid, "questions": records}

    items = [{"index": v, "vid": v} for v in video_ids]
    run_inference_loop(items, infer_video, writer, desc="videomme")
    writer.close()


if __name__ == "__main__":
    main()
