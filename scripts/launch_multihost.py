"""Per-host launcher for multi-host TPU slices (docs/MULTIHOST.md).

Run the SAME command on every host of the slice (gcloud compute tpus tpu-vm
ssh --worker=all ... / a GKE JobSet):

    python scripts/launch_multihost.py --mesh_fsdp 8 --mesh_tensor 8 \
        train -- --model_type videollama2_qwen2 --model_path ... --bits 8

    python scripts/launch_multihost.py --mesh_tensor 8 \
        eval -- --module videollama2_tpu.eval.inference_video_mcqa_videomme \
        --num-chunks 8 --chunk-idx $SLICE_INDEX ...

It initializes jax.distributed (coordinator discovered from the Cloud TPU
metadata env — no flags needed there; --coordinator/--num-processes/
--process-id cover non-TPU clusters), validates the requested mesh against
the discovered global device count, exports the mesh flags, and dispatches
to the task's main() with the argv after `--`.

Replaces the reference's torchrun multi-node launch
(scripts/vllava/pretrain.sh:36-44: torchrun --nnodes $WORLD_SIZE ...); on
TPU the process set is one per HOST, not one per chip, and GSPMD handles
all cross-chip communication from the sharding annotations.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = {
    "train": "videollama2_tpu.train.train",
    "serve_worker": "videollama2_tpu.serve.model_worker",
}


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        description="Multi-host launcher: jax.distributed + mesh + task")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (omit on Cloud TPU)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mesh_data", type=int, default=1)
    ap.add_argument("--mesh_fsdp", type=int, default=-1)
    ap.add_argument("--mesh_tensor", type=int, default=1)
    ap.add_argument("--mesh_expert", type=int, default=1)
    ap.add_argument("--mesh_seq", type=int, default=1)
    ap.add_argument("task", choices=sorted(TASKS) + ["eval"])
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- followed by the task's own args")
    args = ap.parse_args(argv)
    if args.rest and args.rest[0] == "--":
        args.rest = args.rest[1:]
    return args


def resolve_mesh(args, n_devices: int):
    """Fill fsdp=-1 from the global device count and validate the product."""
    fixed = args.mesh_data * args.mesh_tensor * args.mesh_expert * \
        args.mesh_seq
    fsdp = args.mesh_fsdp
    if fsdp == -1:
        if n_devices % fixed:
            raise SystemExit(
                f"{n_devices} devices not divisible by "
                f"data*tensor*expert*seq={fixed}")
        fsdp = n_devices // fixed
    if fixed * fsdp != n_devices:
        raise SystemExit(
            f"mesh {args.mesh_data}x{fsdp}x{args.mesh_tensor}"
            f"x{args.mesh_expert}x{args.mesh_seq} != {n_devices} devices")
    return dict(data=args.mesh_data, fsdp=fsdp, tensor=args.mesh_tensor,
                expert=args.mesh_expert, seq=args.mesh_seq)


def main(argv=None):
    args = parse_args(argv)

    import jax
    kw = {}
    if args.coordinator is not None:
        kw = dict(coordinator_address=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    jax.distributed.initialize(**kw)
    shape = resolve_mesh(args, jax.device_count())
    print(f"[launch] process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices, mesh {shape}", flush=True)

    if args.task == "eval":
        # eval tasks name their driver module: --module pkg.mod [args...]
        ap = argparse.ArgumentParser()
        ap.add_argument("--module", required=True)
        mod_args, rest = ap.parse_known_args(args.rest)
        module = importlib.import_module(mod_args.module)
        sys.argv = [mod_args.module] + rest
    else:
        module = importlib.import_module(TASKS[args.task])
        mesh_flags = [f"--mesh_{k}={v}" for k, v in shape.items()
                      if args.task == "train"]
        sys.argv = [TASKS[args.task]] + mesh_flags + args.rest
    module.main()


if __name__ == "__main__":
    main()
