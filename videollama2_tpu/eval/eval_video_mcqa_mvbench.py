"""MVBench scorer: per-task accuracy table.

Parity: reference videollama2/eval/eval_video_mcqa_mvbench.py:30-64.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_file", required=True)
    args = ap.parse_args()

    with open(args.results_file) as f:
        text = f.read().strip()
    results = (json.loads(text) if text.startswith("[")
               else [json.loads(l) for l in text.splitlines()])

    per_task = defaultdict(lambda: [0, 0])
    for r in results:
        if r.get("gt") is None:
            continue
        per_task[r["task"]][0] += int(r["letter"] == r["gt"])
        per_task[r["task"]][1] += 1

    rows = []
    total_c = total_n = 0
    for task in sorted(per_task):
        c, n = per_task[task]
        rows.append((task, c / max(n, 1), n))
        total_c += c
        total_n += n
    width = max(len(t) for t, _, _ in rows) if rows else 10
    print(f"{'task':<{width}}  acc     n")
    for task, acc, n in rows:
        print(f"{task:<{width}}  {acc:.4f}  {n}")
    print(f"{'OVERALL':<{width}}  {total_c / max(total_n, 1):.4f}  {total_n}")


if __name__ == "__main__":
    main()
