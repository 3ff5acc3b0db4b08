"""Eval harness end-to-end over the vendored benchmark-format fixtures.

VERDICT r2 #1: every inference driver's `main()` runs against fixture files
that mirror the PUBLISHED benchmark schemas (tests/fixtures/* — Video-MME
parquet columns + SRT subtitles, MVBench per-task jsons with video-root
layout, EgoSchema 5-option items, Perception-Test mc_question dict,
index-aligned ActivityNet q/a lists, Video-ChatGPT general/consistency
items, MSVC multi-caption items), then the chunk merge and both local
scorers (+ the GPT-judge offline stub) consume the outputs, asserting on
the accuracy matrices — the full reference QA pipeline (SURVEY §4) without
network or real checkpoints.
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from make_tiny_checkpoint import build_checkpoint
    d = str(tmp_path_factory.mktemp("ckpt"))
    build_checkpoint(d)
    return d


def _write_gif(path, seed=0, n=6):
    rng = np.random.default_rng(seed)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                           dtype=np.uint8))
              for _ in range(n)]
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    frames[0].save(str(path), save_all=True, append_images=frames[1:],
                   duration=50)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    """Video files matching the fixtures' names, in flat and MVBench
    per-task-root layouts."""
    root = tmp_path_factory.mktemp("media")
    for i, name in enumerate(("fixtvid01", "fixtvid02", "fixtvid03")):
        _write_gif(root / f"{name}.gif", seed=i)
    # MVBench roots: star/Charades_v1_480/ + clevrer/video_validation/
    _write_gif(root / "mvb" / "star" / "Charades_v1_480" / "fixtvid01.gif",
               seed=10)
    _write_gif(root / "mvb" / "clevrer" / "video_validation" /
               "fixtvid02.gif", seed=11)
    return str(root)


def _run(module, argv, monkeypatch):
    import importlib
    mod = importlib.import_module(f"videollama2_tpu.eval.{module}")
    monkeypatch.setattr(sys, "argv", ["x"] + argv)
    mod.main()


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


# ---------------------------------------------------------------------------
# Video-MME: parquet -> driver (sub + nosub files) -> merge -> scorer
# ---------------------------------------------------------------------------

def test_videomme_pipeline(ckpt, media, tmp_path, monkeypatch, capsys):
    out = tmp_path / "videomme" / "1_0.json"
    _run("inference_video_mcqa_videomme",
         ["--model-path", ckpt, "--video-folder", media,
          "--subtitle-folder", os.path.join(FIXTURES, "videomme",
                                            "subtitles"),
          "--question-file", os.path.join(FIXTURES, "videomme",
                                          "questions.parquet"),
          "--answer-file", str(out), "--num-chunks", "1", "--chunk-idx",
          "0"], monkeypatch)

    recs = _read_jsonl(out)
    sub_recs = _read_jsonl(tmp_path / "videomme" / "1_0_sub.json")
    assert len(recs) == 3 and len(sub_recs) == 3
    for rec in recs + sub_recs:
        # the reference scorer's full field contract
        assert {"video_id", "youtube_id", "url", "duration", "domain",
                "sub_category", "questions", "missing"} <= set(rec)
        assert rec["missing"] is False
        assert len(rec["questions"]) == 3
        for q in rec["questions"]:
            assert {"question_id", "task_type", "question", "choices",
                    "answer", "response"} <= set(q)
            assert q["response"] in "ABCD"
    assert {r["duration"] for r in recs} == {"short", "medium", "long"}

    # merge (the bash [ ] wrap equivalent) -> reference-contract scorer
    from videollama2_tpu.eval.common import merge_chunks
    merged = tmp_path / "merge.json"
    merge_chunks([str(out)], str(merged))

    from videollama2_tpu.eval.eval_video_mcqa_videomme import \
        eval_your_results
    report = eval_your_results(str(merged),
                               video_types="short,medium,long",
                               skip_missing=True,
                               return_categories_accuracy=True,
                               return_sub_categories_accuracy=True,
                               return_task_types_accuracy=True)
    # every question produced an extractable letter -> all 9 answered
    assert report["overall"]["answered"] == 9
    assert 0 <= report["overall"]["accuracy"] <= 1
    assert report["short"]["domain"]["Knowledge"]["answered"] == 3
    assert report["medium"]["sub_category"]["Basketball"]["answered"] == 3
    assert "Temporal Reasoning" in report["long"]["task_type"]
    capsys.readouterr()  # drain the printed matrices


def test_videomme_subtitle_alignment():
    """SRT parsing + frame-window alignment against the fixture subtitles
    (reference :100-119 semantics: first span containing each sampled
    frame's timestamp, deduped empties, newline-joined)."""
    from videollama2_tpu.eval.inference_video_mcqa_videomme import \
        align_subtitles, parse_srt
    srt = os.path.join(FIXTURES, "videomme", "subtitles", "fixtvid01.srt")
    entries = parse_srt(srt)
    assert len(entries) == 3
    assert entries[0][:2] == (0.0, 2.5)
    assert entries[1][2] == "Something is happening now. It continues."
    # frames at 25 fps: frame 30 = 1.2 s -> block 1; frame 100 = 4 s -> 2
    text = align_subtitles(srt, [30, 100], 25.0)
    assert text == ("Welcome to the video.\n"
                    "Something is happening now. It continues.")


def test_videomme_dump_extraction():
    """videomme_dump parity (:185-227): regex letter, option-text fallback
    with digit->word mapping, default C."""
    from videollama2_tpu.eval.inference_video_mcqa_videomme import \
        videomme_dump
    opts = ["3", "A cat jumps", "Nothing", "The screen"]
    assert videomme_dump({}, "", opts, "(B) obviously") == "B"
    assert videomme_dump({}, "", opts, "The answer is C.") == "C"
    # no letter: option text fallback ('3' -> 'three')
    assert videomme_dump({}, "", opts, "I think three.") == "A"
    assert videomme_dump({}, "", opts, "nothing matches here",) == "C" \
        or videomme_dump({}, "", opts, "zzz") == "C"


# ---------------------------------------------------------------------------
# MVBench: per-task jsons -> driver -> scorer table
# ---------------------------------------------------------------------------

def test_mvbench_pipeline(ckpt, media, tmp_path, monkeypatch, capsys):
    out = tmp_path / "mvbench.jsonl"
    _run("inference_video_mcqa_mvbench",
         ["--model-path", ckpt,
          "--question-file", os.path.join(FIXTURES, "mvbench", "json"),
          "--video-folder", os.path.join(media, "mvb"),
          "--answer-file", str(out)], monkeypatch)
    recs = _read_jsonl(out)
    assert len(recs) == 2
    for r in recs:
        # the reference record contract (:182)
        assert {"vid", "task_type", "pred", "gt"} <= set(r)
        assert isinstance(r["pred"], int) and isinstance(r["gt"], int)
    assert {r["task_type"] for r in recs} == {"Action Sequence",
                                              "Object Existence"}
    gt_by_task = {r["task_type"]: r["gt"] for r in recs}
    assert gt_by_task["Action Sequence"] == 1  # "Sat down." is index 1
    assert gt_by_task["Object Existence"] == 0

    from videollama2_tpu.eval.eval_video_mcqa_mvbench import score
    rep = score(recs)
    assert set(rep["tasks"]) == {"Action Sequence", "Object Existence"}
    assert 0 <= rep["overall"] <= 100


# ---------------------------------------------------------------------------
# EgoSchema / Perception-Test (+ submission-format merges)
# ---------------------------------------------------------------------------

def test_egoschema_driver(ckpt, media, tmp_path, monkeypatch):
    out = tmp_path / "ego.jsonl"
    _run("inference_video_mcqa_egoschema",
         ["--model-path", ckpt, "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "egoschema",
                                          "questions.json"),
          "--answer-file", str(out)], monkeypatch)
    recs = _read_jsonl(out)
    assert len(recs) == 2
    by_uid = {r["q_uid"]: r for r in recs}
    assert 0 <= by_uid["fixtvid01"]["pred_idx"] <= 4
    assert by_uid["missing-video"]["pred_idx"] == 2  # default on failure


def test_perception_driver(ckpt, media, tmp_path, monkeypatch):
    out = tmp_path / "perc.jsonl"
    _run("inference_video_mcqa_perception_test_mcqa",
         ["--model-path", ckpt, "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "perception",
                                          "mc_question_test.json"),
          "--answer-file", str(out)], monkeypatch)
    recs = _read_jsonl(out)
    assert recs[0]["vid"] == "fixtvid01"
    answers = recs[0]["answers"]
    assert [a["id"] for a in answers] == [0, 1]
    for a in answers:
        # the reference per-question record (:147)
        assert {"id", "answer_id", "answer"} <= set(a)
        assert 0 <= a["answer_id"] <= 2
    # submission format: {vid: {mc_question: [...]}}
    sub = {r["vid"]: {"mc_question": r["answers"]} for r in recs}
    assert "fixtvid01" in sub


# ---------------------------------------------------------------------------
# OQA + captioning -> GPT-judge stub
# ---------------------------------------------------------------------------

def test_activitynet_pipeline(ckpt, media, tmp_path, monkeypatch, capsys):
    out = tmp_path / "anet.jsonl"
    _run("inference_video_oqa_activitynet",
         ["--model-path", ckpt, "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "activitynet",
                                          "test_q.json"),
          "--answer-file", os.path.join(FIXTURES, "activitynet",
                                        "test_a.json"),
          "--output-file", str(out)], monkeypatch)
    recs = _read_jsonl(out)
    assert len(recs) == 2
    by_id = {r["id"]: r for r in recs}
    # the reference record contract (:129)
    assert by_id["v_fixtvid01_0"]["answer"] == "dancing"
    assert isinstance(by_id["v_fixtvid01_0"]["pred"], str)
    assert by_id["v_missing_1"]["pred"] == "error"  # missing video (:125)

    # GPT-judge (offline stub) over the answers
    _run("gpt_judge",
         ["--dimension", "activitynet", "--pred-file", str(out),
          "--output-dir", str(tmp_path / "judge"), "--api", "none",
          "--output-json", str(tmp_path / "judge.json")], monkeypatch)
    with open(tmp_path / "judge.json") as f:
        rep = json.load(f)
    assert rep["n"] == 2 and "accuracy" in rep
    capsys.readouterr()


def test_vcgpt_pipeline(ckpt, media, tmp_path, monkeypatch, capsys):
    out_g = tmp_path / "general.jsonl"
    _run("inference_video_oqa_vcgpt",
         ["--mode", "general", "--model-path", ckpt,
          "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "vcgpt",
                                          "general.json"),
          "--answer-file", str(out_g)], monkeypatch)
    recs = _read_jsonl(out_g)
    # the reference record contract (general :110)
    assert {"video_name", "Q", "A", "P"} <= set(recs[0])
    assert recs[0]["A"] == "A blue jacket and jeans."

    out_c = tmp_path / "consistency.jsonl"
    _run("inference_video_oqa_vcgpt",
         ["--mode", "consistency", "--model-path", ckpt,
          "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "vcgpt",
                                          "consistency.json"),
          "--answer-file", str(out_c)], monkeypatch)
    recs = _read_jsonl(out_c)
    # the reference record contract (consistency :124)
    assert {"video_name", "Q1", "Q2", "A", "P1", "P2"} <= set(recs[0])

    # consistency judge consumes Q1/Q2/P1/P2 spellings
    _run("gpt_judge",
         ["--dimension", "consistency", "--pred-file", str(out_c),
          "--output-dir", str(tmp_path / "judge_c"), "--api", "none",
          "--output-json", str(tmp_path / "judge_c.json")], monkeypatch)
    with open(tmp_path / "judge_c.json") as f:
        assert json.load(f)["n"] == 1
    capsys.readouterr()


def test_msvc_pipeline(ckpt, media, tmp_path, monkeypatch, capsys):
    out = tmp_path / "msvc.jsonl"
    _run("inference_video_cap_msvc",
         ["--model-path", ckpt, "--video-folder", media,
          "--question-file", os.path.join(FIXTURES, "msvc", "msvc.json"),
          "--output-file", str(out)], monkeypatch)
    recs = _read_jsonl(out)
    # the reference record contract (:100)
    assert {"video_name", "question", "answer", "pred"} <= set(recs[0])
    assert recs[0]["video_name"] == "fixtvid01.gif"
    assert recs[0]["answer"] == ["A person walks across the room.",
                                 "Someone crosses a room slowly."]

    _run("gpt_judge",
         ["--dimension", "msvc_correctness", "--pred-file", str(out),
          "--output-dir", str(tmp_path / "judge_m"), "--api", "none",
          "--output-json", str(tmp_path / "judge_m.json")], monkeypatch)
    with open(tmp_path / "judge_m.json") as f:
        assert json.load(f)["n"] == 1
    capsys.readouterr()
