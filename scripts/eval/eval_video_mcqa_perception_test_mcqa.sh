#!/bin/bash
# Perception-Test MC-QA: chunk-sharded inference + merged submission JSON.
# Parity: reference scripts/eval/eval_video_mcqa_perception_test_mcqa.sh.

CKPT=${CKPT:-DAMO-NLP-SG/VideoLLaMA2-7B}
EVAL_DATA_DIR=${EVAL_DATA_DIR:-eval}
OUTPUT_DIR=${OUTPUT_DIR:-eval_output}
CKPT_NAME=$(basename ${CKPT})
CHUNKS=${CHUNKS:-1}

out=${OUTPUT_DIR}/perception_test_mcqa/answers/${CKPT_NAME}
output_file=${out}/merge.json

if [ ! -f "$output_file" ]; then
    for IDX in $(seq 0 $((CHUNKS-1))); do
        python -m videollama2_tpu.eval.inference_video_mcqa_perception_test_mcqa \
            --model-path ${CKPT} \
            --video-folder ${EVAL_DATA_DIR}/perception_test_mcqa/videos \
            --question-file ${EVAL_DATA_DIR}/perception_test_mcqa/mc_question_test.json \
            --answer-file ${out}/${CHUNKS}_${IDX}.jsonl \
            --num-chunks $CHUNKS --chunk-idx $IDX &
    done
    wait
    python - <<EOF
import glob, json
from videollama2_tpu.eval.common import merge_chunks
recs = merge_chunks(sorted(glob.glob("${out}/${CHUNKS}_*.jsonl")),
                    "${out}/flat.json", return_records=True)
# submission format (reference merge step): {vid: {"mc_question": [...]}}
sub = {r["vid"]: {"mc_question": r["answers"]} for r in recs}
with open("${output_file}", "w") as f:
    json.dump(sub, f)
print(f"wrote {len(sub)} videos to ${output_file}")
EOF
fi
echo "submit ${output_file} to the Perception-Test eval server"
