#!/bin/bash
# Stage-2 SFT: full model (tower frozen) at lr 2e-5, pad aspect ratio.
# Recipe parity: reference scripts/vllava/finetune.sh:26-70 (global batch 128).

RUN_NAME=${RUN_NAME:-vllava_finetune}
DATA_DIR=${DATA_DIR:-datasets/videollava_sft}
OUTP_DIR=${OUTP_DIR:-work_dirs}

GLOBAL_BATCH_SIZE=${GLOBAL_BATCH_SIZE:-128}
LOCAL_BATCH_SIZE=${LOCAL_BATCH_SIZE:-4}
N_DEVICES=$(python -c "import jax; print(len(jax.devices()))")
GRAD_ACCUM=$((GLOBAL_BATCH_SIZE / (LOCAL_BATCH_SIZE * N_DEVICES)))

python -m videollama2_tpu.train.train \
    --model_type videollama2_mistral \
    --model_path ${MODEL_PATH:-mistralai/Mistral-7B-Instruct-v0.2} \
    --vision_tower openai/clip-vit-large-patch14-336 \
    --mm_projector_type stc_connector \
    --pretrain_mm_mlp_adapter ${OUTP_DIR}/vllava_pretrain/pretrain/adapter-latest \
    --mm_vision_select_layer -2 \
    --image_aspect_ratio pad \
    --data_path ${DATA_DIR}/annotations/videochatgpt_llavaimage_tune.json \
    --data_folder ${DATA_DIR} \
    --num_frames 8 \
    --model_max_length 2048 \
    --output_dir ${OUTP_DIR}/${RUN_NAME}/finetune \
    --num_train_epochs 1 \
    --per_device_train_batch_size ${LOCAL_BATCH_SIZE} \
    --gradient_accumulation_steps ${GRAD_ACCUM} \
    --learning_rate 2e-5 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --save_steps 500 \
    --logging_steps 1 \
    --bf16 true \
    --group_by_modality_length true \
    --mesh_fsdp -1 --mesh_tensor 1
