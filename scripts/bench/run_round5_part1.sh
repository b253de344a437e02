#!/bin/bash
# Round-5 queue, part 1 (VERDICT r4 items 2 and 5):
# (a) Tea full-token at the REFERENCE operating point. Round-4's 2.665x
#     (18/50 calc) was calibrated at calc-frac 0.36 — a conservative
#     guess. The reference's own 3.24x on H200 implies ~15 calc-steps
#     equivalent (50/3.24 = 15.4 incl. overhead); with our measured
#     per-row overhead (~0.8 step-equivalents at 18 calc) frac 0.30 and
#     0.26 bracket it. The published thresh 0.26 itself cannot transfer:
#     the polynomial was fit to a trained checkpoint's embedding scale
#     (synthetic embeds rescale the rel-L1 metric), so matching the
#     reference's SKIP RATE is the faithful comparison. Baseline 213.07 s
#     (round-4 full-token CFG B=2) is injected to save a 360 s re-measure.
# (b) First 720P caching row: 14B 40-step CFG Tea at the sparge keep=0.3
#     operating point, w4a8 — vs the reference's 344 s H200 LightX2V_4
#     720P TeaCache row (BASELINE.md:22). TaylorSeer at 720P is
#     capacity-impossible on one v5e (6*40*75600*5120 fp8 = 92.9 GB
#     cache; documented, not measured).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

echo "=== tea_frac030 start $(date +%H:%M:%S) ==="
timeout 3600 env BENCH_BASE_S=213.07 BENCH_TEA_CALC_FRAC=0.30 \
    python scripts/bench/bench_caching.py Tea \
    >$L/tea_frac030.json 2>$L/tea_frac030.err
echo "=== tea_frac030 exit $? $(date +%H:%M:%S) ==="
cat $L/tea_frac030.json

sleep 60
echo "=== tea_frac026 start $(date +%H:%M:%S) ==="
timeout 3600 env BENCH_BASE_S=213.07 BENCH_TEA_CALC_FRAC=0.26 \
    python scripts/bench/bench_caching.py Tea \
    >$L/tea_frac026.json 2>$L/tea_frac026.err
echo "=== tea_frac026 exit $? $(date +%H:%M:%S) ==="
cat $L/tea_frac026.json

sleep 60
echo "=== caching_14b_720p_tea_sparge start $(date +%H:%M:%S) ==="
timeout 14400 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 \
    BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
    python scripts/bench/bench_caching.py NoCaching Tea \
    >$L/caching_14b_720p_tea_sparge.json 2>$L/caching_14b_720p_tea_sparge.err
echo "=== caching_14b_720p_tea_sparge exit $? $(date +%H:%M:%S) ==="
cat $L/caching_14b_720p_tea_sparge.json
echo "=== part-1 done $(date +%H:%M:%S) ==="
