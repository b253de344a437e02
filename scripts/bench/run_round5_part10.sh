#!/bin/bash
# Round-5 queue, part 10 — FLAGSHIP-scale sparge tables: tune per-layer
# l1 on a structured 14B w4a8 synthetic checkpoint (chunked
# generate->structure->quantize, init_structured_quantized_params_on_device)
# over a real 10-step dense trajectory, then thread the table through the
# flagship e2e row (BENCH_SPARGE_TABLE).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part9b_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== tune_sparge_14b start $(date +%H:%M:%S) ==="
timeout 14400 python -m lightx2v_tpu.tools.tune_sparge --structured \
    --scheme int4 --mm_type W-int4-group-sym-A-int8-token-dynamic-Tpu \
    --trajectory 10 --capture_fracs 0.1,0.5,0.9 --preset 14b \
    --keep_ratio 0.3 --block_q 2048 --block_k 1024 --bar_db 25 \
    --output /tmp/sparge_14b_structured.npz \
    >$L/tune_sparge_14b.json 2>$L/tune_sparge_14b.err
echo "=== tune exit $? $(date +%H:%M:%S) ==="
cat $L/tune_sparge_14b.json
sleep 120

if [ -f /tmp/sparge_14b_structured.npz ]; then
  echo "=== e2e_flagship_tuned_table start $(date +%H:%M:%S) ==="
  # EXACT flagship protocol (bench.py no-env defaults: fused rope, untiled
  # full decode after release, T5 encode in the timed run) + the tuned table
  timeout 10800 env BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
      BENCH_ATTN=sparge BENCH_ROPE_FUSED=1 BENCH_VAE=full BENCH_STEPS=2 \
      BENCH_INCLUDE_ENCODE=1 \
      BENCH_SPARGE_TABLE=/tmp/sparge_14b_structured.npz \
      python bench.py >$L/e2e_flagship_tuned.json 2>$L/e2e_flagship_tuned.err
  echo "=== exit $? $(date +%H:%M:%S) ==="
  cat $L/e2e_flagship_tuned.json
fi
echo "=== part-10 done $(date +%H:%M:%S) ==="
