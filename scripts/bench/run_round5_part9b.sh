#!/bin/bash
# Round-5 queue, part 9b — blocked-path probe on the flagship's K=5120
# qkvo shape (spliced before part-10 so its flagship row can use the
# winner).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part9_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== mm_blocked_probe start $(date +%H:%M:%S) ==="
timeout 7200 env MM_ONLY=blocked \
    python scripts/bench/bench_mm_kernels.py \
    >$L/mm_blocked_probe.json 2>$L/mm_blocked_probe.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/mm_blocked_probe.json
echo "=== part-9b done $(date +%H:%M:%S) ==="
