#!/bin/bash
# Reference analog: scripts/wan/run_wan_i2v_audio.sh (same CLI semantics on the TPU stack).
model_path=${MODEL_PATH:-/path/to/model}
export DTYPE=BF16
export ENABLE_PROFILING_DEBUG=${ENABLE_PROFILING_DEBUG:-false}
python -m lightx2v_tpu.infer \
    --model_cls wan2.1_audio \
    --task i2v \
    --model_path "$model_path" \
    --config_json configs/audio_driven/wan_i2v_audio.json \
    --prompt "${PROMPT:-Two anthropomorphic cats in boxing gear fight on a spotlighted stage.}" --image_path "${IMAGE:-./input.jpg}" --audio_path "${AUDIO:-./input.wav}" \
    --save_video_path "${OUT:-./output_run_wan_i2v_audio.mp4}"
