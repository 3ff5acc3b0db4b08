#!/bin/bash
# Custom full-parameter finetune (tower frozen, 2-LR projector).
# Recipe parity: reference scripts/custom/finetune.sh (global batch 128,
# lr 2e-5, pad aspect ratio); torchrun/DeepSpeed plumbing replaced by mesh
# flags (TPU GSPMD).

RUN_NAME=${RUN_NAME:-custom_ft}
DATA_DIR=${DATA_DIR:-datasets/custom_sft}
OUTP_DIR=${OUTP_DIR:-work_dirs}

python -m videollama2_tpu.train.train \
    --model_type videollama2_mistral \
    --model_path ${MODEL_PATH:-DAMO-NLP-SG/VideoLLaMA2-7B-Base} \
    --mm_projector_type stc_connector \
    --pretrain_mm_mlp_adapter ${ADAPTER_PATH:-} \
    --data_path ${DATA_DIR}/custom.json \
    --data_folder ${DATA_DIR} \
    --mm_vision_select_layer -2 \
    --image_aspect_ratio pad \
    --num_frames 8 \
    --model_max_length 2048 \
    --output_dir ${OUTP_DIR}/${RUN_NAME} \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --gradient_accumulation_steps 4 \
    --learning_rate 2e-5 \
    --mm_projector_lr 2e-5 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --save_steps 500 --logging_steps 1 --bf16 true \
    --mesh_fsdp -1
