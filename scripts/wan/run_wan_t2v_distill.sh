#!/bin/bash
# 4-step distilled t2v (reference: scripts/wan/run_wan_t2v_distill_4step_cfg.sh).
model_path=${MODEL_PATH:-/path/to/Wan2.1-T2V-14B-StepDistill-CfgDistill}
python -m lightx2v_tpu.infer \
    --model_cls wan2.1_distill \
    --task t2v \
    --model_path "$model_path" \
    --config_json configs/wan_t2v_distill_4step_cfg.json \
    --prompt "${PROMPT:-A sailboat gliding across a glassy bay at dawn.}" \
    --save_video_path "${OUT:-./output_distill.mp4}"
