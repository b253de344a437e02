#!/bin/bash
# Offline t2v generation (reference: scripts/wan/run_wan_t2v.sh).
model_path=${MODEL_PATH:-/path/to/Wan2.1-T2V-1.3B}
export DTYPE=BF16
export ENABLE_PROFILING_DEBUG=${ENABLE_PROFILING_DEBUG:-false}
python -m lightx2v_tpu.infer \
    --model_cls wan2.1 \
    --task t2v \
    --model_path "$model_path" \
    --config_json configs/wan_t2v.json \
    --prompt "${PROMPT:-Two anthropomorphic cats in boxing gear fight on a spotlighted stage.}" \
    --save_video_path "${OUT:-./output_t2v.mp4}"
