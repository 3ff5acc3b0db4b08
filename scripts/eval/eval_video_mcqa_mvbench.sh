#!/bin/bash
# MVBench eval: chunked inference + per-task accuracy table.
# Parity: reference scripts/eval/eval_video_mcqa_mvbench.sh.
CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}
out=${OUTPUT_DIR}/mvbench/answers/${CKPT_NAME}
for IDX in $(seq 0 $((CHUNKS-1))); do
    python -m videollama2_tpu.eval.inference_video_mcqa_mvbench \
        --model-path ${CKPT} \
        --question-file ${EVAL_DATA_DIR}/mvbench/json \
        --video-folder ${EVAL_DATA_DIR}/mvbench/video \
        --answer-file ${out}/${CHUNKS}_${IDX}.jsonl \
        --num-chunks $CHUNKS --chunk-idx $IDX &
done
wait
python - <<PYEOF
from videollama2_tpu.eval.common import merge_chunks
import glob
merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")), "${out}/merge.json")
PYEOF
python -m videollama2_tpu.eval.eval_video_mcqa_mvbench --pred_path ${out}/merge.json
