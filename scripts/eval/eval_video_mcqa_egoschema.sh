#!/bin/bash
# EgoSchema MC-QA: chunk-sharded inference + Kaggle-format CSV merge.
# Parity: reference scripts/eval/eval_video_mcqa_egoschema.sh (GPU sharding
# generalized to N parallel host processes over the TPU slice).

CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}

out=${OUTPUT_DIR}/egoschema/answers/${CKPT_NAME}
output_file=${out}/merge.csv

if [ ! -f "$output_file" ]; then
    for IDX in $(seq 0 $((CHUNKS-1))); do
        python -m videollama2_tpu.eval.inference_video_mcqa_egoschema \
            --model-path ${CKPT} \
            --video-folder ${EVAL_DATA_DIR}/egoschema/good_clips_git \
            --question-file ${EVAL_DATA_DIR}/egoschema/questions.json \
            --answer-file ${out}/${CHUNKS}_${IDX}.jsonl \
            --num-chunks $CHUNKS --chunk-idx $IDX &
    done
    wait
    python - <<EOF
import csv, glob
from videollama2_tpu.eval.common import merge_chunks
recs = merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")),
                    "${out}/merge.json", return_records=True)
with open("${output_file}", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["q_uid", "answer"])          # Kaggle submission header
    for r in recs:
        w.writerow([r["q_uid"], r["pred_idx"]])
print(f"wrote {len(recs)} rows to ${output_file}")
EOF
fi
echo "submit ${output_file} to the EgoSchema Kaggle leaderboard"
