#!/bin/bash
# Round-4 queue, part 8: CogVideoX e2e retry (tile_jit per-tile decode —
# the traced grid OOMed at 73.76 GB) and int8-weights + sparge retry
# (pad-free selection pooling shaves the ~0.7 GB that left part-5's
# attempt 1.63 GB over HBM).
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

run e2e_480p_cog_bf16_r2 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

run e2e_480p_rel_full4_int8sparge_r2 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

echo "=== part-8 done $(date +%H:%M:%S) ==="
