#!/bin/bash
# Round-4 queue, part 1: attack the VAE-decode share of the flagship e2e
# (VERDICT r3 "weak #2/#3"): release DiT weights after the last denoise
# step, then try the untiled full-frame decode (1.78x less conv work than
# tiled) which OOMed beside resident 14B weights in round 3.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r4}
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 3600 env "$@" python bench.py >$L/$name.json 2>$L/$name.err
  echo "=== $name exit $? $(date +%H:%M:%S) ==="
  cat $L/$name.json
}

# 0. sanity (strict kernel dispatch proof rides along)
run tiny BENCH_PRESET=tiny

# 1. full (untiled) decode after release, chunk=2 then chunk=4
run e2e_480p_rel_full2 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=2 BENCH_STEPS=2
run e2e_480p_rel_full4 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

# 2. tiled decode with release (control: does release alone change anything)
run e2e_480p_rel_tiled4 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_STEPS=2

echo "=== part-1 done $(date +%H:%M:%S) ==="
