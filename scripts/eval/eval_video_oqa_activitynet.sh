#!/bin/bash
# ActivityNet-QA (also MSVD-QA with different folders): inference + GPT judge.
# Parity: reference scripts/eval/eval_video_oqa_activitynet.sh.
CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}
out=${OUTPUT_DIR}/activitynet/answers/${CKPT_NAME}
for IDX in $(seq 0 $((CHUNKS-1))); do
    python -m videollama2_tpu.eval.inference_video_oqa_activitynet \
        --model-path ${CKPT} \
        --video-folder ${EVAL_DATA_DIR}/activitynet/videos \
        --question-file ${EVAL_DATA_DIR}/activitynet/test_q.json \
        --answer-file ${EVAL_DATA_DIR}/activitynet/test_a.json \
        --output-file ${out}/${CHUNKS}_${IDX}.jsonl \
        --num-chunks $CHUNKS --chunk-idx $IDX &
done
wait
python - <<PYEOF
from videollama2_tpu.eval.common import merge_chunks
import glob
merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")), "${out}/merge.json")
PYEOF
python -m videollama2_tpu.eval.gpt_judge --dimension activitynet \
    --pred-file ${out}/merge.json --output-dir ${out}/judge \
    --output-json ${out}/results.json ${JUDGE_ARGS:---api none}
