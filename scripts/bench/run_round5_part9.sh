#!/bin/bash
# Round-5 queue, part 9 — Hunyuan protocol-complete e2e retry #2.
# Part-5's attempt died at TRACE time: the w4a8 synthetic Llama's
# group-128 scales gave the blocked w4a8 kernel a 64-lane packed block
# (illegal Mosaic block shape) at the down-projection's K=14336.
# Fixed to group-512 (the DiT convention) in encoders/llama.py.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part8_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== e2e_480p_hunyuan_protocol_r2 start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_MODEL=hunyuan BENCH_MODE=e2e \
    BENCH_INCLUDE_ENCODE=1 BENCH_MM=int4a8 BENCH_VAE=ttile \
    BENCH_VAE_TTILE=4 BENCH_STEPS=2 BENCH_LLAMA_SCHEME=w4a8 \
    python bench.py \
    >$L/e2e_480p_hunyuan_protocol_r2.json 2>$L/e2e_480p_hunyuan_protocol_r2.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_480p_hunyuan_protocol_r2.json
echo "=== part-9 done $(date +%H:%M:%S) ==="
