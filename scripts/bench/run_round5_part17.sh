#!/bin/bash
# Round-5 queue, part 17 — 720P whole-stack Taylor (TaylorWS) row:
# per-module TaylorSeer/Custom caches are 6*L*S*D (~20.8 GB fp8 at 14B
# 720P — over one v5e; the 480P-fit fp8 variant's step program also
# kills the remote compile helper at 720P, part 15). TaylorWS keeps ONE
# (B, S, D) f0/f1 pair (~775 MB fp8) — the streamed path's semantics,
# now available resident (pipeline feature_caching="TaylorWS").
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part16_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== taylor_ws_720p start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 \
    BENCH_BASE_B1_S=871.8 \
    python scripts/bench/bench_caching.py TaylorWS \
    >$L/taylor_ws_720p.json 2>$L/taylor_ws_720p.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/taylor_ws_720p.json
echo "=== part-17 done $(date +%H:%M:%S) ==="
