#!/bin/bash
# Round-5 queue, part 19 — TaylorWS 720P retry after the bf16-cache-math
# fix (fp32 r/f0/f1 temps were ~4.6 GB over the forward peak).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part18_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== taylor_ws_720p_r2 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 \
    BENCH_BASE_B1_S=871.8 \
    python scripts/bench/bench_caching.py TaylorWS \
    >$L/taylor_ws_720p_r2.json 2>$L/taylor_ws_720p_r2.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/taylor_ws_720p_r2.json
echo "=== part-19 done $(date +%H:%M:%S) ==="
