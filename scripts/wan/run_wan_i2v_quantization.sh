#!/bin/bash
# Reference analog: scripts/wan/run_wan_i2v_quantization.sh (same CLI semantics on the TPU stack).
model_path=${MODEL_PATH:-/path/to/model}
export DTYPE=BF16
export ENABLE_PROFILING_DEBUG=${ENABLE_PROFILING_DEBUG:-false}
python -m lightx2v_tpu.infer \
    --model_cls wan2.1 \
    --task i2v \
    --model_path "$model_path" \
    --config_json configs/wan_i2v_quant_int8.json \
    --prompt "${PROMPT:-Two anthropomorphic cats in boxing gear fight on a spotlighted stage.}" --image_path "${IMAGE:-./input.jpg}" \
    --save_video_path "${OUT:-./output_run_wan_i2v_quantization.mp4}"
