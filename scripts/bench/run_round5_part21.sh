#!/bin/bash
# Round-5 queue, part 21 (UNRUN — queued for a future session) — 720P Tea
# caching row with the TUNED per-layer sparge table (+ dense prefix).
# Part-5's 305.57 s / 2.853x row ran the uniform-l1 table; part-18 showed
# the 480P-tuned table transfers to 720P (89.05 s vs 96.15 s distill e2e,
# -7.4%). For a like-for-like speedup ratio BOTH rows rerun with the
# table: the reference's protocol is Tea-speedup = NoCaching/Tea at one
# config (docs cache_source.md) — injecting the uniform-table 871.8 s
# baseline under a tuned-table Tea numerator would inflate the ratio.
# Protocol pinned from part-5: B=1 (B=2 CFG 720P kills the remote compile
# helper), split-branch host scheduling, fp8 residual cache (the variant
# that fits 75.6k tokens). Expected ~32 min device time (two ~430 s
# compiles + ~810 s baseline + ~285 s Tea).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

echo "=== tea_720p_tuned start $(date +%H:%M:%S) ==="
timeout 14400 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
    BENCH_TEA_CACHE_DTYPE=fp8 \
    BENCH_SPARGE_TABLE=configs/sparge/wan_t2v_14b_structured_keep03.npz \
    python scripts/bench/bench_caching.py NoCaching Tea \
    >$L/tea_720p_tuned.json 2>$L/tea_720p_tuned.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/tea_720p_tuned.json
echo "=== part-21 done $(date +%H:%M:%S) ==="
