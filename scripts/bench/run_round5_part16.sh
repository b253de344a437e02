#!/bin/bash
# Round-5 queue, part 16 — 720P-trajectory sparge tuning + tuned 720P
# flagship e2e (the 480P table's thresholds are shape-calibrated; tune at
# the real 75.6k-token shape before applying).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part15_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== tune_sparge_14b_720p start $(date +%H:%M:%S) ==="
timeout 14400 python -m lightx2v_tpu.tools.tune_sparge --structured \
    --scheme int4 --mm_type W-int4-group-sym-A-int8-token-dynamic-Tpu \
    --trajectory 6 --capture_fracs 0.2,0.8 --preset 14b \
    --frames 21 --height 90 --width 160 \
    --keep_ratio 0.3 --block_q 2048 --block_k 1024 --bar_db 25 \
    --output /tmp/sparge_14b_720p.npz \
    >$L/tune_sparge_14b_720p.json 2>$L/tune_sparge_14b_720p.err
echo "=== tune exit $? $(date +%H:%M:%S) ==="
cat $L/tune_sparge_14b_720p.json
sleep 120
if [ -f /tmp/sparge_14b_720p.npz ]; then
  echo "=== e2e_720p_tuned start $(date +%H:%M:%S) ==="
  timeout 10800 env BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
      BENCH_ATTN=sparge BENCH_ROPE_FUSED=1 BENCH_STEPS=2 \
      BENCH_H=90 BENCH_W=160 BENCH_VAE=full BENCH_VAE_CHUNK=1 \
      BENCH_SPARGE_TABLE=/tmp/sparge_14b_720p.npz \
      python bench.py >$L/e2e_720p_tuned.json 2>$L/e2e_720p_tuned.err
  echo "=== exit $? $(date +%H:%M:%S) ==="
  cat $L/e2e_720p_tuned.json
fi
echo "=== part-16 done $(date +%H:%M:%S) ==="
