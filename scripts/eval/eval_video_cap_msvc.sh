#!/bin/bash
# MSVC multi-sentence captioning: inference + correctness & detailedness
# judges. Parity: reference scripts/eval/eval_video_cap_msvc.sh.
CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}
out=${OUTPUT_DIR}/msvc/answers/${CKPT_NAME}
output_file=${out}/merge.json
if [ ! -f "$output_file" ]; then
    for IDX in $(seq 0 $((CHUNKS-1))); do
        python -m videollama2_tpu.eval.inference_video_cap_msvc \
            --model-path ${CKPT} \
            --video-folder ${EVAL_DATA_DIR}/msvc \
            --question-file ${EVAL_DATA_DIR}/msvc/msvc.json \
            --output-file ${out}/${CHUNKS}_${IDX}.jsonl \
            --num-chunks $CHUNKS --chunk-idx $IDX &
    done
    wait
    python - <<PYEOF
from videollama2_tpu.eval.common import merge_chunks
import glob
merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")), "${output_file}")
PYEOF
fi
python -m videollama2_tpu.eval.gpt_judge --dimension msvc_correctness \
    --pred-file ${output_file} --output-dir ${out}/judge_correctness \
    --output-json ${out}/results_correctness.json ${JUDGE_ARGS:---api none}
python -m videollama2_tpu.eval.gpt_judge --dimension msvc_detailedness \
    --pred-file ${output_file} --output-dir ${out}/judge_detailedness \
    --output-json ${out}/results_detailedness.json ${JUDGE_ARGS:---api none}
