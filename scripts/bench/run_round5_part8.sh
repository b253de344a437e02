#!/bin/bash
# Round-5 queue, part 8 — kernel-level decomposition of the flagship
# denoise step: w4a8/w8a8/fused-FFN matmul TFLOP/s and sparge-vs-flash
# attention at the 14B 480P/720P shapes, plus a (bm, bn) sweep for the
# w4a8 fullk path. Goal: locate the ~1.5-2x gap between the measured
# 6.6 s/step and the kernel-roofline estimate, then tune tile defaults.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part7_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== bench_mm_kernels start $(date +%H:%M:%S) ==="
timeout 10800 env MM_SWEEP=1 \
    python scripts/bench/bench_mm_kernels.py \
    >$L/mm_kernels.json 2>$L/mm_kernels.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/mm_kernels.json
echo "=== part-8 done $(date +%H:%M:%S) ==="
