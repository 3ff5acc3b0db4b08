"""Video-MME scorer: accuracy matrices by duration / domain / sub-category /
task type.

Parity: reference videollama2/eval/eval_video_mcqa_videomme.py:7-199 — the
reference hard-codes the category taxonomy; here grouping is data-driven over
whatever metadata fields the ground-truth file carries, which produces the
same matrices for Video-MME data.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from typing import Dict, List

GROUP_KEYS = ("duration", "domain", "sub_category", "task_type")


def score(results: List[dict], ground_truth: Dict[str, dict]) -> dict:
    total, correct = 0, 0
    groups = {k: defaultdict(lambda: [0, 0]) for k in GROUP_KEYS}
    for rec in results:
        for q in rec.get("questions", []):
            qid = q.get("question_id")
            gt = ground_truth.get(str(qid))
            if gt is None:
                continue
            total += 1
            ok = (q.get("letter", "C") == gt["answer"])
            correct += int(ok)
            for k in GROUP_KEYS:
                if k in gt:
                    g = groups[k][gt[k]]
                    g[0] += int(ok)
                    g[1] += 1
    out = {"overall_accuracy": correct / max(total, 1), "total": total}
    for k in GROUP_KEYS:
        if groups[k]:
            out[k] = {name: {"accuracy": c / max(n, 1), "n": n}
                      for name, (c, n) in sorted(groups[k].items())}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_file", required=True)
    ap.add_argument("--ground_truth_file", required=True,
                    help="JSON mapping question_id -> {answer, duration, "
                         "domain, sub_category, task_type}")
    ap.add_argument("--output_file", default=None)
    args = ap.parse_args()

    with open(args.results_file) as f:
        text = f.read().strip()
    results = (json.loads(text) if text.startswith("[")
               else [json.loads(l) for l in text.splitlines()])
    with open(args.ground_truth_file) as f:
        gt = json.load(f)

    report = score(results, gt)
    print(json.dumps(report, indent=2))
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
