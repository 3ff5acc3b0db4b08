"""Drive bench.py's TPU-branch logic (int8 packs, int8 tower, tight prefill
bucket, pipelined iterations) on the tiny CPU config via BENCH_SMALL_FULL=1.

The driver runs `python bench.py` exactly once per round on real hardware;
without this test the quantize/bucket branches would execute for the first
time there, and any error only surfaces as a dead BENCH_rN entry.
"""

import json
import os
import subprocess
import sys


def test_bench_small_full_path_emits_result():
    env = dict(os.environ, PLATFORM="cpu", BENCH_SMALL_FULL="1",
               BENCH_BATCH="2")
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["value"] > 0, (result, proc.stderr[-2000:])
    bd = result["breakdown"]
    # quantize branch + the round-5 default int8 KV cache + I420 wire
    assert bd["weights"] == "int8-weights+kv8+i420wire"
    assert bd["kv_bits"] == 8
    assert bd["wire"] == "i420"
    assert bd["decode_ms_per_tok"] > 0
    assert "persistent_cache" in bd
