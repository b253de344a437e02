#!/bin/sh
# Reproduce the lightx2v_3 row of the benchmark table (reference
# scripts/bench/run_lightx2v_3.sh) on TPU hardware.
cd "$(dirname "$0")/../.." || exit 1
exec python -m lightx2v_tpu.infer \
    --model_cls wan2.1 --task t2v \
    --model_path "${MODEL_PATH:?set MODEL_PATH to the Wan checkpoint dir}" \
    --config_json configs/bench/lightx2v_3.json \
    --prompt "A spirited cat gracefully leaping between rooftops at golden hour" \
    --save_video_path outputs/bench_lightx2v_3.mp4 "$@"
