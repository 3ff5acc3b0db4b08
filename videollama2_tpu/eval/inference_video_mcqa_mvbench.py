"""MVBench multiple-choice QA inference (20 sub-tasks).

Parity: reference videollama2/eval/inference_video_mcqa_mvbench.py — the
20-task table with per-task annotation files, video roots, media types
(video / frame-dir / gif), and start/end second bounds (:78-99); option
shuffling is not used (answers come with the data); letter extraction with
option fallback (:124-149).
"""

from __future__ import annotations

import argparse
import json
import os

from .common import ResultWriter, extract_choice_letter, get_chunk, \
    run_inference_loop

# (task_name, annotation_file, video_subdir, media_type, has_start_end)
MVBENCH_TASKS = [
    ("action_sequence", "action_sequence.json", "star/Charades_v1_480/",
     "video", True),
    ("action_prediction", "action_prediction.json", "star/Charades_v1_480/",
     "video", True),
    ("action_antonym", "action_antonym.json", "ssv2_video/", "video", False),
    ("fine_grained_action", "fine_grained_action.json",
     "Moments_in_Time_Raw/videos/", "video", False),
    ("unexpected_action", "unexpected_action.json", "FunQA_test/test/",
     "video", False),
    ("object_existence", "object_existence.json",
     "clevrer/video_validation/", "video", False),
    ("object_interaction", "object_interaction.json",
     "star/Charades_v1_480/", "video", True),
    ("object_shuffle", "object_shuffle.json", "perception/videos/", "video",
     False),
    ("moving_direction", "moving_direction.json",
     "clevrer/video_validation/", "video", False),
    ("action_localization", "action_localization.json", "sta/sta_video/",
     "video", True),
    ("scene_transition", "scene_transition.json", "scene_qa/video/", "video",
     False),
    ("action_count", "action_count.json", "perception/videos/", "video",
     False),
    ("moving_count", "moving_count.json", "clevrer/video_validation/",
     "video", False),
    ("moving_attribute", "moving_attribute.json",
     "clevrer/video_validation/", "video", False),
    ("state_change", "state_change.json", "perception/videos/", "video",
     False),
    ("fine_grained_pose", "fine_grained_pose.json", "nturgbd/", "video",
     False),
    ("character_order", "character_order.json", "perception/videos/",
     "video", False),
    ("egocentric_navigation", "egocentric_navigation.json", "vlnqa/",
     "video", False),
    ("episodic_reasoning", "episodic_reasoning.json", "tvqa/frames_fps3_hq/",
     "frame", True),
    ("counterfactual_inference", "counterfactual_inference.json",
     "clevrer/video_validation/", "video", False),
]

SYSTEM_PROMPT = ("Carefully watch the video and pay attention to the cause "
                 "and sequence of events, the detail and movement of "
                 "objects, and the action and pose of persons. Based on "
                 "your observations, select the best option that accurately "
                 "addresses the question.\n")


def build_prompt(question: str, candidates) -> str:
    letters = [chr(ord("A") + i) for i in range(len(candidates))]
    opts = "\n".join(f"({l}) {c}" for l, c in zip(letters, candidates))
    return (SYSTEM_PROMPT + question + "\nOptions:\n" + opts +
            "\nOnly give the best option.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--question-file", required=True,
                    help="directory of MVBench json annotation files")
    ap.add_argument("--video-folder", required=True)
    ap.add_argument("--answer-file", required=True)
    ap.add_argument("--num-chunks", type=int, default=1)
    ap.add_argument("--chunk-idx", type=int, default=0)
    args = ap.parse_args()

    from .. import mm_infer, model_init
    model, processor, tokenizer = model_init(args.model_path)

    samples = []
    for task, ann_file, subdir, media_type, has_se in MVBENCH_TASKS:
        path = os.path.join(args.question_file, ann_file)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for j, item in enumerate(json.load(f)):
                samples.append(dict(
                    index=f"{task}:{j}", task=task,
                    video=os.path.join(args.video_folder, subdir,
                                       item["video"]),
                    media_type=media_type,
                    question=item["question"],
                    candidates=item["candidates"],
                    answer=item["answer"],
                    start=item.get("start"), end=item.get("end")))
    samples = get_chunk(samples, args.num_chunks, args.chunk_idx)

    writer = ResultWriter(args.answer_file, key="index")

    def infer(item):
        from ..media.preprocess import process_video
        tensor = process_video(item["video"], model.config.vision,
                               s=item["start"], e=item["end"],
                               aspect_ratio=None,
                               num_frames=model.config.num_frames)
        prompt = build_prompt(item["question"], item["candidates"])
        try:
            resp = mm_infer(tensor, prompt, model, tokenizer, modal="video",
                            max_new_tokens=64)
        except Exception:
            resp = "C"
        letters = [chr(ord("A") + i) for i in range(len(item["candidates"]))]
        letter = extract_choice_letter(resp, item["candidates"],
                                       letters=letters)
        gt_letter = letters[item["candidates"].index(item["answer"])] \
            if item["answer"] in item["candidates"] else None
        return dict(task=item["task"], response=resp, letter=letter,
                    gt=gt_letter)

    run_inference_loop(samples, infer, writer, desc="mvbench")
    writer.close()


if __name__ == "__main__":
    main()
