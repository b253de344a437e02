#!/bin/sh
# Reproduce the lightx2v_5_distill row of the benchmark table (reference
# scripts/bench/run_lightx2v_5_distill.sh) on TPU hardware.
cd "$(dirname "$0")/../.." || exit 1
exec python -m lightx2v_tpu.infer \
    --model_cls wan2.1_distill --task t2v \
    --model_path "${MODEL_PATH:?set MODEL_PATH to the Wan checkpoint dir}" \
    --config_json configs/bench/lightx2v_5_distill.json \
    --prompt "A spirited cat gracefully leaping between rooftops at golden hour" \
    --save_video_path outputs/bench_lightx2v_5_distill.mp4 "$@"
