#!/bin/bash
# Round-5 queue, part 6:
# (a) Protocol-complete CogVideoX e2e: T5-v1.1 encode INSIDE the timed
#     run + int8 denoise + the decode that won part 3's ladder (tiled
#     overlap-0.125, 15.61 s vs 20.8 s r4 chunked; the full-frame
#     chunked + encode-staged compile crashed the remote helper, and
#     frame_batch=4 is a real OOM — remat_uncompressed copies).
# (b) Sparge tuner retry with the flash-trajectory fix (dense-xla
#     capture compiled a 51 GB f32[12,32760,32760] logits buffer), then
#     the tuned-table TPU row it feeds.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part5_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== e2e_480p_cog_protocol_tiled start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_INCLUDE_ENCODE=1 BENCH_MM=int8 BENCH_VAE=tiled \
    BENCH_VAE_TILE=32 BENCH_VAE_OVERLAP=0.125 BENCH_VAE_FRAME_BATCH=2 \
    BENCH_STEPS=2 python bench.py \
    >$L/e2e_480p_cog_protocol_tiled.json 2>$L/e2e_480p_cog_protocol_tiled.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_480p_cog_protocol_tiled.json
sleep 120

echo "=== tune_sparge_structured_r2 start $(date +%H:%M:%S) ==="
timeout 7200 python -m lightx2v_tpu.tools.tune_sparge --structured \
    --trajectory 10 --capture_fracs 0.1,0.5,0.9 --preset 1.3b \
    --keep_ratio 0.3 --block_q 2048 --block_k 1024 --bar_db 25 \
    --output /tmp/sparge_1.3b_structured.npz \
    >$L/tune_sparge_structured_r2.json 2>$L/tune_sparge_structured_r2.err
echo "=== tune_sparge exit $? $(date +%H:%M:%S) ==="
cat $L/tune_sparge_structured_r2.json
sleep 120

if [ -f /tmp/sparge_1.3b_structured.npz ]; then
  echo "=== fwd_13b_sparge_tuned start $(date +%H:%M:%S) ==="
  timeout 3600 env BENCH_PRESET=1.3b BENCH_ATTN=sparge BENCH_STEPS=3 \
      BENCH_SPARGE_TABLE=/tmp/sparge_1.3b_structured.npz \
      python bench.py >$L/fwd_13b_sparge_tuned.json 2>$L/fwd_13b_sparge_tuned.err
  echo "=== exit $? ==="
  cat $L/fwd_13b_sparge_tuned.json
fi
echo "=== part-6 done $(date +%H:%M:%S) ==="
