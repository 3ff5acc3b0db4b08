"""Training entry point.

Parity: reference videollama2/train.py:393-574 — flag names match the
reference's dataclass args (model_type/model_path/vision_tower/
mm_projector_type/tune_mm_mlp_adapter/pretrain_mm_mlp_adapter/data_path/
num_frames/mm_projector_lr/...), with the torchrun/DeepSpeed plumbing
replaced by the mesh arguments. Launch:

  python -m videollama2_tpu.train.train \
    --model_type videollama2_mistral --model_path CKPT \
    --data_path anno.json --data_folder media/ \
    --output_dir out/ --tune_mm_mlp_adapter true ...
"""

from __future__ import annotations

import argparse
import os


def parse_bool(x: str) -> bool:
    return str(x).lower() in ("1", "true", "yes")


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    # ModelArguments (train.py:70-84)
    ap.add_argument("--model_type", default="videollama2_mistral")
    ap.add_argument("--model_path", required=True,
                    help="HF checkpoint dir (LLM or full videollama2)")
    ap.add_argument("--version", default="v1")
    ap.add_argument("--freeze_backbone", type=parse_bool, default=False)
    ap.add_argument("--mm_projector_type", default="stc_connector")
    ap.add_argument("--tune_mm_mlp_adapter", type=parse_bool, default=False)
    ap.add_argument("--pretrain_mm_mlp_adapter", default=None)
    ap.add_argument("--vision_tower", default=None)
    ap.add_argument("--mm_vision_select_layer", type=int, default=-2)
    ap.add_argument("--mm_vision_select_feature", default="patch")
    # DataArguments (train.py:87-99)
    ap.add_argument("--data_path", nargs="+", required=True)
    ap.add_argument("--data_folder", default=None)
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--image_aspect_ratio", default="pad")
    ap.add_argument("--is_pretraining", type=parse_bool, default=None,
                    help="defaults to tune_mm_mlp_adapter")
    # TrainingArguments (train.py:102-134)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--per_device_train_batch_size", type=int, default=4)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--learning_rate", type=float, default=2e-5)
    ap.add_argument("--mm_projector_lr", type=float, default=None)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--warmup_ratio", type=float, default=0.03)
    ap.add_argument("--lr_scheduler_type", default="cosine")
    ap.add_argument("--model_max_length", type=int, default=2048)
    ap.add_argument("--save_steps", type=int, default=500)
    ap.add_argument("--logging_steps", type=int, default=10)
    ap.add_argument("--group_by_modality_length", type=parse_bool,
                    default=False)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--bf16", type=parse_bool, default=True)
    # LoRA (train.py:125-133)
    ap.add_argument("--lora_enable", type=parse_bool, default=False)
    ap.add_argument("--lora_r", type=int, default=128)
    ap.add_argument("--lora_alpha", type=int, default=256)
    ap.add_argument("--lora_dropout", type=float, default=0.05)
    ap.add_argument("--bits", type=int, default=16)
    # mesh (replaces torchrun/DeepSpeed config)
    ap.add_argument("--mesh_data", type=int, default=1)
    ap.add_argument("--mesh_fsdp", type=int, default=-1)
    ap.add_argument("--mesh_tensor", type=int, default=1)
    ap.add_argument("--mesh_seq", type=int, default=1,
                    help="Ulysses sequence-parallel degree (long context)")
    return ap


def main():
    args = build_argparser().parse_args()

    import jax
    from transformers import AutoTokenizer

    from ..checkpoint import convert_hf, orbax_io
    from ..core import config as cfglib
    from . import data as data_lib
    from . import optimizer as opt_lib
    from .trainer import Trainer, TrainerConfig

    # 1. model config + params
    if os.path.exists(os.path.join(args.model_path, "config.json")):
        import json
        with open(os.path.join(args.model_path, "config.json")) as f:
            cfg_json = json.load(f)
        if cfg_json.get("model_type", "").startswith("videollama2") or \
                "mm_vision_tower" in cfg_json:
            cfg, params = convert_hf.load_videollama2(args.model_path)
        else:
            # plain LLM checkpoint + fresh vision/connector init
            # (train.py:425-446 + initialize_vision_modules :496)
            cfg = cfglib.preset(args.model_type)
            import dataclasses
            cfg = dataclasses.replace(
                cfg,
                connector=dataclasses.replace(
                    cfg.connector,
                    projector_type=args.mm_projector_type),
                vision=dataclasses.replace(
                    cfg.vision,
                    select_layer=args.mm_vision_select_layer))
            llm = convert_hf.llm_params_from_state_dict(
                convert_hf.load_state_dict_from_dir(args.model_path),
                cfg.llm)
            from ..models import connector as conn_lib
            from ..models import vit as vit_lib
            rng = jax.random.PRNGKey(args.seed)
            params = {
                "llm": llm,
                "vision": vit_lib.init_params(rng, cfg.vision),
                "connector": conn_lib.init_params(rng, cfg.connector),
            }
    else:
        raise FileNotFoundError(args.model_path)

    if args.num_frames:
        cfg = cfg.replace(num_frames=args.num_frames)

    # QLoRA / quantized-base training (reference train.py:404-423): the LLM
    # base is frozen in int8 or packed-int4 (ops/quant; dense dequantizes
    # in-graph) and only adapters train.
    if args.bits in (4, 8):
        from ..ops import quant
        params["llm"] = quant.quantize_llm_params(params["llm"],
                                                  bits=args.bits)

    # LoRA (reference train.py:465-481): inject per-matmul adapters
    if args.lora_enable:
        import jax as _jax
        from . import lora as lora_lib
        lcfg = lora_lib.LoraConfig(r=args.lora_r, alpha=args.lora_alpha,
                                   dropout=args.lora_dropout)
        params["llm"] = lora_lib.inject_lora(
            _jax.random.PRNGKey(args.seed), params["llm"], lcfg)

    if args.pretrain_mm_mlp_adapter:
        # load pretrain-stage projector (videollama2_arch.py:77-96)
        if os.path.exists(os.path.join(args.pretrain_mm_mlp_adapter,
                                       "mm_projector.npz")):
            params["connector"] = orbax_io.load_projector_only(
                args.pretrain_mm_mlp_adapter, params["connector"])
        else:
            params["connector"] = convert_hf.load_pretrain_adapter(
                args.pretrain_mm_mlp_adapter, cfg.connector)

    # 2. data
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    if tokenizer.pad_token is None and tokenizer.unk_token is not None:
        tokenizer.pad_token = tokenizer.unk_token
    is_pre = (args.is_pretraining if args.is_pretraining is not None
              else args.tune_mm_mlp_adapter)
    data_args = data_lib.DataArguments(
        data_path=args.data_path, data_folder=args.data_folder,
        is_pretraining=is_pre, num_frames=args.num_frames,
        image_aspect_ratio=args.image_aspect_ratio,
        model_max_length=args.model_max_length)
    dataset = data_lib.SupervisedDataset(args.data_path, tokenizer,
                                         data_args, cfg)

    # 3. optimizer + trainer
    opt_cfg = opt_lib.OptimizerConfig(
        learning_rate=args.learning_rate,
        mm_projector_lr=args.mm_projector_lr,
        weight_decay=args.weight_decay, warmup_ratio=args.warmup_ratio,
        schedule=args.lr_scheduler_type,
        tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
        freeze_backbone=args.freeze_backbone,
        lora_enable=args.lora_enable)
    tcfg = TrainerConfig(
        output_dir=args.output_dir,
        per_device_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        num_epochs=args.num_train_epochs, max_steps=args.max_steps,
        seq_len=args.model_max_length, save_steps=args.save_steps,
        log_steps=args.logging_steps, seed=args.seed,
        group_by_modality_length=args.group_by_modality_length,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mesh_data=args.mesh_data, mesh_fsdp=args.mesh_fsdp,
        mesh_tensor=args.mesh_tensor, mesh_seq=args.mesh_seq)

    trainer = Trainer(cfg, params, dataset, opt_cfg, tcfg)
    trainer.train()


if __name__ == "__main__":
    main()
