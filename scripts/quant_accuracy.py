"""CLI for the quantization-accuracy harness (eval/quant_accuracy.py).

Default (no --model-path): instantiates a tiny random HF Mistral through the
real checkpoint converter — the same fixture family the parity suite uses —
and prints the drift table for every quantized configuration. With
--model-path it measures a real converted checkpoint (offline; once weights
are available), so the numbers upgrade from structural to empirical without
code changes.

  PLATFORM=cpu python scripts/quant_accuracy.py
  python scripts/quant_accuracy.py --model-path /path/to/ckpt --steps 32
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None,
                    help="converted checkpoint dir (default: tiny random "
                         "HF fixture)")
    ap.add_argument("--model-type", default="mistral")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    if os.environ.get("PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.eval import quant_accuracy as qa

    if args.model_path:
        from videollama2_tpu.checkpoint import convert_hf
        cfg, params = convert_hf.load_videollama2(args.model_path)
        cfg, params = cfg.llm, params["llm"]
        dtype = jnp.bfloat16
    else:
        import torch
        from videollama2_tpu.checkpoint.convert_hf import (
            llm_params_from_state_dict)
        from tests.test_llm_parity import _hf_model
        torch.manual_seed(0)
        cfg = cfglib.tiny_llm(args.model_type)
        hf = _hf_model(args.model_type, cfg).eval()
        params = llm_params_from_state_dict(hf.state_dict(), cfg)
        dtype = jnp.float32

    rng = np.random.default_rng(0)
    prompts = [np.concatenate([[1], rng.integers(
        4, cfg.vocab_size - 1, rng.integers(8, args.bucket // 2))])
        for _ in range(args.prompts)]

    results = qa.measure(params, cfg, prompts, steps=args.steps,
                         bucket=args.bucket, dtype=dtype)
    if args.json:
        print(json.dumps(results, indent=2))
    else:
        print(qa.format_table(results))


if __name__ == "__main__":
    main()
