"""Build the vendored benchmark-format fixtures (run once, outputs are
checked in; re-run to regenerate deterministically).

Each fixture mirrors the PUBLISHED schema of its benchmark so the eval
drivers' field accesses are validated against the real formats:
  * videomme/questions.parquet — the lmms-lab/Video-MME parquet columns
    (video_id/duration/domain/sub_category/url/videoID/question_id/
    task_type/question/options/answer; one row per question, 3 per video),
    consumed by reference inference_video_mcqa_videomme.py:135-171.
  * videomme/subtitles/*.srt — standard SRT blocks for the subtitle-
    alignment path (:100-119).
  * mvbench/json/*.json — MVBench per-task annotation lists
    ({video, question, candidates, answer} + start/end for bounded tasks),
    reference inference_video_mcqa_mvbench.py:45-53.
  * egoschema/questions.json — {q_uid, question, option 0..4} (reference
    inference_video_mcqa_egoschema.py:44-60).
  * perception/mc_question_test.json — {video_id: {mc_question:
    [{id, question, options}]}} (reference ..._perception_test_mcqa.py).
  * activitynet/test_q.json + test_a.json — index-aligned question/answer
    lists (reference inference_video_oqa_activitynet.py:42-45).
  * vcgpt/general.json + consistency.json — Video-ChatGPT benchmark items
    ({video_name, Q, A} / {video_name, Q1, Q2, A}).
  * msvc/msvc.json — {video_path, question, captions} items.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# three videos, one per duration class; youtube-id style names
VIDEOS = [
    ("001", "fixtvid01", "short", "Knowledge", "Humanity & History"),
    ("002", "fixtvid02", "medium", "Sports Competition", "Basketball"),
    ("003", "fixtvid03", "long", "Life Record", "Daily Life"),
]
TASK_TYPES = ["Action Recognition", "Object Recognition",
              "Temporal Reasoning"]


def build_videomme():
    import pandas as pd
    rows = []
    for vid, ytid, duration, domain, sub in VIDEOS:
        for j, task in enumerate(TASK_TYPES, start=1):
            rows.append({
                "video_id": vid,
                "duration": duration,
                "domain": domain,
                "sub_category": sub,
                "url": f"https://www.youtube.com/watch?v={ytid}",
                "videoID": ytid,
                "question_id": f"{vid}-{j}",
                "task_type": task,
                "question": f"What happens in segment {j} of the video?",
                "options": ["A. A red square appears.",
                            "B. A cat jumps over a chicken.",
                            "C. Nothing happens at all.",
                            "D. The screen goes black."],
                "answer": "ABCD"[j % 4],
            })
    d = os.path.join(HERE, "videomme")
    os.makedirs(os.path.join(d, "subtitles"), exist_ok=True)
    pd.DataFrame(rows).to_parquet(os.path.join(d, "questions.parquet"))
    for _, ytid, _, _, _ in VIDEOS:
        with open(os.path.join(d, "subtitles", f"{ytid}.srt"), "w") as f:
            f.write("1\n00:00:00,000 --> 00:00:02,500\n"
                    "Welcome to the video.\n\n"
                    "2\n00:00:02,500 --> 00:00:10,000\n"
                    "Something is happening now.\\NIt continues.\n\n"
                    "3\n00:00:10,000 --> 00:01:00,000\n"
                    "The long tail of the video.\n")


def build_mvbench():
    d = os.path.join(HERE, "mvbench", "json")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "action_sequence.json"), "w") as f:
        json.dump([{"video": "fixtvid01.gif",
                    "question": "What did the person do first?",
                    "candidates": ["Opened the door.", "Sat down.",
                                   "Jumped.", "Waved."],
                    "answer": "Sat down.",
                    "start": 0.0, "end": 2.0}], f, indent=1)
    with open(os.path.join(d, "object_existence.json"), "w") as f:
        json.dump([{"video": "fixtvid02.gif",
                    "question": "Is there a cube in the scene?",
                    "candidates": ["Yes.", "No.", "Cannot tell."],
                    "answer": "Yes."}], f, indent=1)


def build_egoschema():
    d = os.path.join(HERE, "egoschema")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "questions.json"), "w") as f:
        json.dump([{
            "q_uid": "fixtvid01",
            "question": "What is the overarching activity of the video?",
            "option 0": "Cooking a meal.",
            "option 1": "Fixing a bike.",
            "option 2": "Painting a wall.",
            "option 3": "Playing with a cat.",
            "option 4": "Reading a book.",
        }, {
            "q_uid": "missing-video",
            "question": "What happens here?",
            "option 0": "a", "option 1": "b", "option 2": "c",
            "option 3": "d", "option 4": "e",
        }], f, indent=1)


def build_perception():
    d = os.path.join(HERE, "perception")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "mc_question_test.json"), "w") as f:
        json.dump({"fixtvid01": {"mc_question": [
            {"id": 0, "question": "Where is the object at the end?",
             "options": ["on the table", "on the floor", "in a bag"]},
            {"id": 1, "question": "How many actions occur?",
             "options": ["one", "two", "three"]},
        ]}}, f, indent=1)


def build_activitynet():
    d = os.path.join(HERE, "activitynet")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "test_q.json"), "w") as f:
        json.dump([{"video_name": "fixtvid01",
                    "question": "what is the person doing",
                    "question_id": "v_fixtvid01_0"},
                   {"video_name": "doesnotexist",
                    "question": "what color is the ball",
                    "question_id": "v_missing_1"}], f, indent=1)
    with open(os.path.join(d, "test_a.json"), "w") as f:
        json.dump([{"question_id": "v_fixtvid01_0", "type": 3,
                    "answer": "dancing"},
                   {"question_id": "v_missing_1", "type": 0,
                    "answer": "red"}], f, indent=1)


def build_vcgpt():
    d = os.path.join(HERE, "vcgpt")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "general.json"), "w") as f:
        json.dump([{"video_name": "fixtvid01",
                    "Q": "Describe what the person is wearing.",
                    "A": "A blue jacket and jeans."}], f, indent=1)
    with open(os.path.join(d, "consistency.json"), "w") as f:
        json.dump([{"video_name": "fixtvid01",
                    "Q1": "When does the person enter the room?",
                    "Q2": "At what point does the person come into the room?",
                    "A": "At the beginning."}], f, indent=1)


def build_msvc():
    d = os.path.join(HERE, "msvc")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "msvc.json"), "w") as f:
        json.dump([{"video_path": "fixtvid01.gif",
                    "question": "Please describe this video in detail.",
                    "captions": ["A person walks across the room.",
                                 "Someone crosses a room slowly."]}],
                  f, indent=1)


if __name__ == "__main__":
    build_videomme()
    build_mvbench()
    build_egoschema()
    build_perception()
    build_activitynet()
    build_vcgpt()
    build_msvc()
    print("fixtures written under", HERE)
