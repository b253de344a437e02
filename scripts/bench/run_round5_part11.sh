#!/bin/bash
# Round-5 queue, part 11 — tuned-table quality + dense-prefix rows:
# 1. fidelity ladder int8-sparge-tuned rung (per-layer l1 + dense prefix
#    for the tuner-failed layers 0-1) vs the uniform int8-sparge0.3 rung;
# 2. 1.3B tuned-table forward WITH the dense prefix (part-6's 1183 ms row
#    ran the table without the prefix — this prices the quality fix).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part10_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== fidelity_sparge_tuned start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_PRESET=1.3b \
    BENCH_SPARGE_TABLE=configs/sparge/wan_t2v_1_3b_structured_keep03.npz \
    BENCH_RUNGS=int8-sparge0.3,int8-sparge-tuned BENCH_FID_VAE_INT8=0 \
    python scripts/bench/bench_fidelity.py \
    >$L/fidelity_sparge_tuned.json 2>$L/fidelity_sparge_tuned.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity_sparge_tuned.json
sleep 120

echo "=== fwd_13b_sparge_tuned_prefix start $(date +%H:%M:%S) ==="
timeout 3600 env BENCH_PRESET=1.3b BENCH_ATTN=sparge BENCH_STEPS=3 \
    BENCH_SPARGE_TABLE=configs/sparge/wan_t2v_1_3b_structured_keep03.npz \
    python bench.py >$L/fwd_13b_sparge_tuned_prefix.json 2>$L/fwd_13b_sparge_tuned_prefix.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/fwd_13b_sparge_tuned_prefix.json
echo "=== part-11 done $(date +%H:%M:%S) ==="
