#!/bin/bash
# Round-5 queue, part 18 — 720P e2e with the 480P-TUNED table (the
# native-720P tune OOMs in the per-layer grid eval beside 7 GB of
# weights at 75.6k tokens; l1 is a softmax mass budget, roughly
# shape-transferable — labeled honestly as 480P-tuned).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part17_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== e2e_720p_tuned480 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_ROPE_FUSED=1 BENCH_STEPS=2 \
    BENCH_H=90 BENCH_W=160 BENCH_VAE=full BENCH_VAE_CHUNK=1 \
    BENCH_SPARGE_TABLE=configs/sparge/wan_t2v_14b_structured_keep03.npz \
    python bench.py >$L/e2e_720p_tuned480.json 2>$L/e2e_720p_tuned480.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_720p_tuned480.json
echo "=== part-18 done $(date +%H:%M:%S) ==="
