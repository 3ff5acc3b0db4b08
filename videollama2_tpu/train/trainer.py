"""Training loop: batching, sharded steps, logging, checkpoint/auto-resume.

Replaces HF Trainer + DeepSpeed (reference videollama2_trainer.py:223-369;
train.py:393-570). The loop is deliberately thin: all heavy lifting lives in
the jitted sharded step (train/step.py); the host side only feeds static
batches from the modality-grouped sampler and handles checkpoint cadence.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..checkpoint import orbax_io
from ..parallel import mesh as mesh_lib
from . import data as data_lib
from . import optimizer as opt_lib
from . import step as step_lib


@dataclass
class TrainerConfig:
    output_dir: str = "./output"
    per_device_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    num_epochs: int = 1
    max_steps: Optional[int] = None
    seq_len: int = 2048
    save_steps: int = 500
    log_steps: int = 10
    seed: int = 42
    group_by_modality_length: bool = False
    compute_dtype: str = "bfloat16"
    # mesh
    mesh_data: int = 1
    mesh_fsdp: int = -1
    mesh_tensor: int = 1
    mesh_seq: int = 1


class Trainer:
    def __init__(self, model_cfg: ModelConfig, params: Any,
                 dataset: data_lib.SupervisedDataset,
                 opt_cfg: opt_lib.OptimizerConfig,
                 trainer_cfg: TrainerConfig):
        self.model_cfg = model_cfg
        self.dataset = dataset
        self.opt_cfg = opt_cfg
        self.cfg = trainer_cfg

        self.mesh = mesh_lib.make_mesh(
            data=trainer_cfg.mesh_data, fsdp=trainer_cfg.mesh_fsdp,
            tensor=trainer_cfg.mesh_tensor, seq=trainer_cfg.mesh_seq)
        self.collator = data_lib.Collator(model_cfg, trainer_cfg.seq_len)

        n_batches = len(dataset) // self._global_batch()
        total_steps = trainer_cfg.max_steps or max(
            n_batches * trainer_cfg.num_epochs, 1)
        self.total_steps = total_steps
        opt_cfg = dataclasses.replace(opt_cfg, total_steps=total_steps)
        self.tx = opt_lib.build_optimizer(params, opt_cfg)

        dtype = getattr(jnp, trainer_cfg.compute_dtype)
        trainable = opt_lib.trainable_mask(params, opt_cfg)
        with self.mesh:
            self.state = step_lib.init_sharded_state(
                self.mesh, params, self.tx,
                is_moe=model_cfg.llm.is_moe)
            self.step_fn = step_lib.make_train_step(
                model_cfg, self.tx, mesh=self.mesh, compute_dtype=dtype,
                grad_accum=trainer_cfg.gradient_accumulation_steps,
                trainable=trainable,
                sequence_parallel=trainer_cfg.mesh_seq > 1)

        # auto-resume (train.py:554-557)
        ckpt_dir = os.path.join(trainer_cfg.output_dir, "checkpoints")
        step = orbax_io.latest_step(ckpt_dir)
        self.start_step = 0
        self._last_saved = -1
        if step is not None:
            print(f"Resuming from checkpoint step {step}")
            self.state = orbax_io.restore_train_state(ckpt_dir, self.state,
                                                      step)
            self.start_step = step

    def _global_batch(self) -> int:
        return (self.cfg.per_device_batch_size
                * self.cfg.gradient_accumulation_steps
                * self.mesh.shape["data"] * self.mesh.shape["fsdp"])

    def _batch_iterator(self, epoch: int):
        gb = self._global_batch()
        if self.cfg.group_by_modality_length:
            sampler = data_lib.LengthGroupedBatchSampler(
                gb, self.dataset.modality_lengths,
                seed=self.cfg.seed + epoch)
            for idxs in sampler:
                yield self.collator([self.dataset[i] for i in idxs])
        else:
            rng = np.random.default_rng(self.cfg.seed + epoch)
            order = rng.permutation(len(self.dataset))
            for i in range(0, len(order) - gb + 1, gb):
                yield self.collator(
                    [self.dataset[j] for j in order[i:i + gb]])

    def train(self):
        step = self.start_step
        t0 = time.time()
        log_path = os.path.join(self.cfg.output_dir, "train_log.jsonl")
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        self._install_preemption_handler()
        with self.mesh, open(log_path, "a") as logf:
            for epoch in range(self.cfg.num_epochs):
                for batch in self._batch_iterator(epoch):
                    if step >= self.total_steps:
                        break
                    self.state, metrics = self.step_fn(self.state, batch)
                    step += 1
                    if self._preempted:
                        # preemption-safe shutdown (beyond reference — HF
                        # Trainer dies uncheckpointed on SIGTERM): TPU pools
                        # commonly run preemptible; save NOW and exit clean
                        # so auto-resume continues from this exact step
                        print(f"preemption signal received — saving at "
                              f"step {step} and exiting", flush=True)
                        self.save(step)
                        return self.state
                    if step % self.cfg.log_steps == 0:
                        m = {k: float(v) for k, v in metrics.items()}
                        m.update(step=step,
                                 sec_per_step=(time.time() - t0)
                                 / self.cfg.log_steps)
                        t0 = time.time()
                        print(f"step {step}: loss={m['loss']:.4f} "
                              f"acc={m['accuracy']:.3f} "
                              f"({m['sec_per_step']:.2f}s/step)")
                        logf.write(json.dumps(m) + "\n")
                        logf.flush()
                    if step % self.cfg.save_steps == 0:
                        self.save(step)
            self.save(step)
        return self.state

    def _install_preemption_handler(self):
        import signal

        self._preempted = False

        def _on_term(signum, frame):
            self._preempted = True
        try:
            signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            # not the main thread (embedded/test use) — preemption save
            # unavailable, training still runs
            pass

    def save(self, step: int):
        if step == self._last_saved:
            return
        self._last_saved = step
        ckpt_dir = os.path.join(self.cfg.output_dir, "checkpoints")
        if self.opt_cfg.tune_mm_mlp_adapter:
            # pretrain stage: projector-only save
            # (videollama2_trainer.py:320-341)
            orbax_io.save_projector_only(
                os.path.join(self.cfg.output_dir, f"adapter-{step}"),
                jax.device_get(self.state.params["connector"]))
        if self.opt_cfg.lora_enable:
            # LoRA split save: peft-format adapters + non-LoRA trainables
            # (videollama2_trainer.py:343-361; train.py:562-568), readable
            # back by convert_hf.load_videollama2 path (a)
            orbax_io.export_lora_split(
                os.path.join(self.cfg.output_dir, f"lora-{step}"),
                jax.device_get(self.state.params["llm"]),
                jax.device_get(self.state.params["connector"]),
                self.model_cfg)
        orbax_io.save_train_state(ckpt_dir, step, self.state)
        print(f"saved checkpoint at step {step}")
