#!/bin/bash
# Round-4 queue, part 12: (a) the PROTOCOL-COMPLETE flagship row — T5
# encode folded into the timed e2e (BENCH_INCLUDE_ENCODE=1: on-device
# int8 UMT5-XXL, encode -> release T5 -> denoise -> release DiT ->
# untiled decode) — closes the "e2e excludes T5" caveat with a measured
# number; (b) FULL-token Taylor/Custom via split-branch host scheduling
# (one_step_calc/_skip: two half-sized programs instead of the
# dual-branch cond program that kills the remote compile helper);
# (c) CogVideoX e2e re-run to capture the denoise/decode split prints;
# (d) retries of the two part-11 compile-helper HTTP 500s.
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

run e2e_480p_rel_full4_t5enc BENCH_PRESET=14b BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_ROPE_FUSED=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 \
    BENCH_INCLUDE_ENCODE=1 BENCH_E2E_SPLIT=1 BENCH_STEPS=2

sleep 20
# full-token Taylor + Custom (fp8 cache, B=1), split-branch host
# scheduling — the 4th attempt at these rows, first with the fix
echo "=== caching_taylor_custom_split start $(date +%H:%M:%S) ==="
timeout 7200 env python scripts/bench/bench_caching.py TaylorSeer Custom \
    >$L/caching_taylor_custom_split.json 2>$L/caching_taylor_custom_split.err
echo "=== caching_taylor_custom_split exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor_custom_split.json

sleep 20
run e2e_480p_cog_bf16_split BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
run e2e_480p_hunyuan_w4a8_ttile8_r2 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_VAE=ttile BENCH_VAE_TTILE=8 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
# Taylor cache-dtype fidelity at half tokens (bf16- vs fp8-cache SNR);
# Taylor legs now step through the split-branch programs
echo "=== cache_fidelity_r2 start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_CACHE_FIDELITY=1 BENCH_H=60 BENCH_W=52 \
    python scripts/bench/bench_caching.py \
    >$L/cache_fidelity_r2.json 2>$L/cache_fidelity_r2.err
echo "=== cache_fidelity_r2 exit $? $(date +%H:%M:%S) ==="
cat $L/cache_fidelity_r2.json

echo "=== part-12 done $(date +%H:%M:%S) ==="
