#!/bin/bash
# Round-5 queue, part 17 — 720P Custom caching row (Tea decision +
# WHOLE-STACK Taylor replay): per-module TaylorSeer at 14B 720P needs
# ~46 GB of caches (40 blocks x 3 modules x 75.6k x 5120) — the
# whole-stack f0/f1 pair is 2 x 387 MB fp8 and fits.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part16_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== custom_720p_fp8 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
    BENCH_BASE_B1_S=871.8 \
    python scripts/bench/bench_caching.py Custom \
    >$L/custom_720p_fp8.json 2>$L/custom_720p_fp8.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/custom_720p_fp8.json
echo "=== part-17 done $(date +%H:%M:%S) ==="
