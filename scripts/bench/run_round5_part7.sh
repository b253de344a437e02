#!/bin/bash
# Round-5 queue, part 7:
# (a) Ada at the reference's published operating point via a host-FORCED
#     evenly-spaced schedule at calc-frac 0.37 (BENCH_ADA_FORCE_FRAC) —
#     the matched-calc-count comparison VERDICT r4 weak-#2 asked for
#     (the codebook's achievable frac bisects to [0.12, 0.18] on
#     synthetic weights, so the 5.47x r4 row is at a different, sparser
#     point than the reference's 2.73x). B=1 full-token protocol vs the
#     99.6 s injected baseline.
# (b) Flagship e2e with bf16 rope rotation (LIGHTX2V_ROPE_BF16=1): the
#     fidelity ladder bounded its cost at ~nothing (int8-sparge rung
#     42.32 dB, frame SNR unchanged) and its fidelity-harness wall went
#     26.66 -> 24.97 s; if the flagship row improves on 32.15 s this
#     becomes the default.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part6_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== ada_forced037 start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ENABLE_CFG=0 BENCH_BASE_B1_S=99.6 \
    BENCH_ADA_FORCE_FRAC=0.37 \
    python scripts/bench/bench_caching.py Ada \
    >$L/ada_forced037.json 2>$L/ada_forced037.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/ada_forced037.json
sleep 120

echo "=== e2e_flagship_bf16rope start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_ATTN=sparge LIGHTX2V_ROPE_BF16=1 \
    python bench.py >$L/e2e_flagship_bf16rope.json 2>$L/e2e_flagship_bf16rope.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_flagship_bf16rope.json
echo "=== part-7 done $(date +%H:%M:%S) ==="
