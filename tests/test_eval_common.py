"""Eval harness unit tests: chunking, answer extraction, result resume."""

import json

import numpy as np

from videollama2_tpu.eval.common import (ResultWriter, extract_choice_letter,
                                         get_chunk, merge_chunks, split_list)
from videollama2_tpu.eval.eval_video_mcqa_videomme import (
    eval_your_results, extract_characters_regex)


def test_split_and_chunk():
    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert sum(len(c) for c in chunks) == 10
    assert get_chunk(lst, 3, 0) == chunks[0]
    assert get_chunk(lst, 3, 7) == []  # out-of-range chunk is empty


def test_extract_choice_letter():
    assert extract_choice_letter("A") == "A"
    assert extract_choice_letter("(B)") == "B"
    assert extract_choice_letter("B.") == "B"
    assert extract_choice_letter("The answer is C") == "C"
    assert extract_choice_letter("Answer: (D)") == "D"
    opts = ["(A) a red car", "(B) a blue boat", "(C) nothing", "(D) x"]
    assert extract_choice_letter("I see a blue boat here", opts) == "B"
    assert extract_choice_letter("", opts) == "C"  # default fallback
    assert extract_choice_letter("E", letters=("A", "B", "C", "D", "E")) == "E"


def test_result_writer_resume(tmp_path):
    path = str(tmp_path / "r.jsonl")
    w = ResultWriter(path)
    w.write({"index": "a", "v": 1})
    w.write({"index": "b", "v": 2})
    w.close()
    w2 = ResultWriter(path)
    assert w2.is_done("a") and w2.is_done("b") and not w2.is_done("c")
    w2.close()


def test_merge_chunks(tmp_path):
    p1, p2 = str(tmp_path / "1.jsonl"), str(tmp_path / "2.jsonl")
    with open(p1, "w") as f:
        f.write(json.dumps({"x": 1}) + "\n")
    with open(p2, "w") as f:
        f.write(json.dumps({"x": 2}) + "\n" + json.dumps({"x": 3}) + "\n")
    out = str(tmp_path / "m.json")
    n = merge_chunks([p1, p2], out)
    assert n == 3
    with open(out) as f:
        assert len(json.load(f)) == 3


def test_videomme_extract_characters_regex():
    """Reference extract_characters_regex semantics (:64-85)."""
    assert extract_characters_regex("A") == "A"
    assert extract_characters_regex("The best answer is (B).") == "B"
    assert extract_characters_regex("answer C obviously") == "C"
    # >10 words with no letter -> unanswered
    assert extract_characters_regex(
        "this response rambles on and on without ever picking one of "
        "the options") == ""
    assert extract_characters_regex("") == ""


def test_videomme_eval_results(tmp_path, capsys):
    """eval_your_results over the reference results-file contract."""
    results = [
        {"duration": "short", "domain": "Knowledge",
         "sub_category": "Law", "missing": False,
         "questions": [
             {"task_type": "OCR Problems", "answer": "A", "response": "A"},
             {"task_type": "Counting Problem", "answer": "C",
              "response": "B"}]},
        {"duration": "short", "domain": "Sports Competition",
         "sub_category": "Esports", "missing": True,   # skipped
         "questions": [
             {"task_type": "OCR Problems", "answer": "A",
              "response": "A"}]},
    ]
    p = tmp_path / "merge.json"
    p.write_text(json.dumps(results))
    rep = eval_your_results(str(p), video_types="short", skip_missing=True,
                            return_task_types_accuracy=True)
    assert rep["overall"] == {"correct": 1, "answered": 2,
                              "accuracy": 0.5}
    assert rep["short"]["domain"]["Knowledge"]["answered"] == 2
    assert rep["short"]["task_type"]["OCR Problems"]["correct"] == 1
    capsys.readouterr()
