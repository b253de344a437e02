#!/bin/bash
# Round-5 queue, part 15 — 720P TaylorSeer caching row (extends the 720P
# caching coverage beyond Tea; same B=1 like-for-like protocol vs the
# 871.8 s NoCaching baseline, fp8 cache entries for capacity).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part14_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== taylor_720p_fp8 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 \
    BENCH_BASE_B1_S=871.8 \
    python scripts/bench/bench_caching.py TaylorSeer \
    >$L/taylor_720p_fp8.json 2>$L/taylor_720p_fp8.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/taylor_720p_fp8.json
echo "=== part-15 done $(date +%H:%M:%S) ==="
