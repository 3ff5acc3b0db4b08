#!/bin/bash
# Video-MME eval: chunk-sharded inference workers + merge + scorer.
# Parity: reference scripts/eval/eval_video_mcqa_videomme.sh:19-85, with the
# one-process-per-GPU sharding generalized to N parallel host processes
# (each process drives the same TPU chip/slice; on multi-host, set
# CHUNKS to the host count and run one per host).

CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}

output_file=${OUTPUT_DIR}/videomme/answers/${CKPT_NAME}/merge.json

if [ ! -f "$output_file" ]; then
    for IDX in $(seq 0 $((CHUNKS-1))); do
        python -m videollama2_tpu.eval.inference_video_mcqa_videomme \
            --model-path ${CKPT} \
            --video-folder ${EVAL_DATA_DIR}/videomme/videos \
            --subtitle-folder ${EVAL_DATA_DIR}/videomme/subtitles \
            --question-file ${EVAL_DATA_DIR}/videomme/test-00000-of-00001.parquet \
            --answer-file ${OUTPUT_DIR}/videomme/answers/${CKPT_NAME}/${CHUNKS}_${IDX}.jsonl \
            --num-chunks $CHUNKS --chunk-idx $IDX &
    done
    wait
    python - <<EOF
from videollama2_tpu.eval.common import merge_chunks
import glob
n = merge_chunks(sorted(glob.glob("${OUTPUT_DIR}/videomme/answers/${CKPT_NAME}/${CHUNKS}_*.jsonl")), "${output_file}")
print(f"merged {n} records")
EOF
fi

python -m videollama2_tpu.eval.eval_video_mcqa_videomme \
    --results_file ${output_file} \
    --ground_truth_file ${EVAL_DATA_DIR}/videomme/ground_truth.json
