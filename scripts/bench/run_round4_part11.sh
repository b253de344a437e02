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

echo "=== part-11 done $(date +%H:%M:%S) ==="
