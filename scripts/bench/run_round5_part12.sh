#!/bin/bash
# Round-5 queue, part 12 — first measured CausVid AR row (1.3B, 480P,
# 21-frame window, 3 blocks x 9 distilled steps, KV window 32760 tokens).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part11_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== causvid_13b start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_PRESET=1.3b BENCH_MM=bf16 BENCH_STEPS=2 \
    python scripts/bench/bench_causvid.py \
    >$L/causvid_13b.json 2>$L/causvid_13b.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/causvid_13b.json
sleep 120

echo "=== causvid_13b_int8 start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_PRESET=1.3b BENCH_MM=int8 BENCH_STEPS=2 \
    python scripts/bench/bench_causvid.py \
    >$L/causvid_13b_int8.json 2>$L/causvid_13b_int8.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/causvid_13b_int8.json
echo "=== part-12 done $(date +%H:%M:%S) ==="
