#!/bin/bash
# VideoChatGPT-bench dimension 5 consistency: inference + GPT judge.
# Parity: reference scripts/eval/eval_video_oqa_vcgpt_5_consistency.sh.
CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}
out=${OUTPUT_DIR}/videochatgpt_gen/answers/consistency/${CKPT_NAME}
output_file=${out}/merge.json
if [ ! -f "$output_file" ]; then
    for IDX in $(seq 0 $((CHUNKS-1))); do
        python -m videollama2_tpu.eval.inference_video_oqa_vcgpt \
            --mode consistency \
            --model-path ${CKPT} \
            --video-folder ${EVAL_DATA_DIR}/videochatgpt_gen/Test_Videos \
            --question-file ${EVAL_DATA_DIR}/videochatgpt_gen/consistency_qa.json \
            --answer-file ${out}/${CHUNKS}_${IDX}.jsonl \
            --num-chunks $CHUNKS --chunk-idx $IDX &
    done
    wait
    python - <<PYEOF
from videollama2_tpu.eval.common import merge_chunks
import glob
merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")), "${output_file}")
PYEOF
fi
python -m videollama2_tpu.eval.gpt_judge --dimension consistency \
    --pred-file ${output_file} --output-dir ${out}/judge \
    --output-json ${out}/results.json ${JUDGE_ARGS:---api none}
