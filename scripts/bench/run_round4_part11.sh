#!/bin/bash
# Round-4 queue, part 11: Hunyuan decode attack — temporal-only tiling
# at full spatial frames (decode-after-release frees the HBM): no
# spatial halo redundancy (the 32/24 spatial tiles redo 1.78x the conv
# work). Probe t_tile 4 then 8.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r4}
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 5400 env "$@" python bench.py >$L/$name.json 2>$L/$name.err
  echo "=== $name exit $? $(date +%H:%M:%S) ==="
  cat $L/$name.json
}

run e2e_480p_hunyuan_w4a8_ttile4 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_VAE=ttile BENCH_VAE_TTILE=4 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
run e2e_480p_hunyuan_w4a8_ttile8 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_VAE=ttile BENCH_VAE_TTILE=8 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
# fp8-cache quality bound (NEXT_STEPS perf 4): Taylor bf16-cache vs
# fp8-cache vs NoCaching latent SNR at the half-token B=1 protocol
echo "=== cache_fidelity start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_CACHE_FIDELITY=1 BENCH_H=60 BENCH_W=52 \
    python scripts/bench/bench_caching.py \
    >$L/cache_fidelity.json 2>$L/cache_fidelity.err
echo "=== cache_fidelity exit $? $(date +%H:%M:%S) ==="
cat $L/cache_fidelity.json

sleep 20
# 14B 40-step CFG TeaCache row AT THE FLAGSHIP ATTENTION OPERATING POINT
# (w4a8 + sparge keep=0.3): round-2's dense row was 297 s = 1.81x vs the
# 107 s H200 LightX2V_4 row; sparge should push it past 2x. Measures its
# own NoCaching-with-sparge baseline for an honest speedup column.
echo "=== caching_14b_tea_sparge start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_TEA_CALC_FRAC=0.35 \
    python scripts/bench/bench_caching.py NoCaching Tea \
    >$L/caching_14b_tea_sparge.json 2>$L/caching_14b_tea_sparge.err
echo "=== caching_14b_tea_sparge exit $? $(date +%H:%M:%S) ==="
cat $L/caching_14b_tea_sparge.json

echo "=== part-11 done $(date +%H:%M:%S) ==="
