#!/bin/bash
# Round-5 queue, part 13 — flagship tuned-table e2e RETRY with the
# cond-based dense prefix (part-10's segmented-scan form OOMed on weight
# slice remat copies).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part12_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== e2e_flagship_tuned_r2 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_ROPE_FUSED=1 BENCH_VAE=full BENCH_STEPS=2 \
    BENCH_INCLUDE_ENCODE=1 \
    BENCH_SPARGE_TABLE=configs/sparge/wan_t2v_14b_structured_keep03.npz \
    python bench.py >$L/e2e_flagship_tuned_r2.json 2>$L/e2e_flagship_tuned_r2.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_flagship_tuned_r2.json
echo "=== part-13 done $(date +%H:%M:%S) ==="
