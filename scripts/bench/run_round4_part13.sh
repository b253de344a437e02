#!/bin/bash
# Round-4 queue, part 13: (a) FULL-token Taylor/Custom, 5th attempt —
# split-branch host scheduling (part 12) got past the compile-helper
# kill but OOMed at runtime because the calc scan stacked a second
# full-size cache; the DUS-carry rewrite holds ONE cache in the step
# program; (b) cache-dtype fidelity rerun (same OOM root cause);
# (c) CogVideoX decode probes: full-frame chunked decode (no spatial
# halo redundancy) at frame_batch 2 and 4 — decode is 20.81 s of the
# 37.03 s e2e, the bigger half.
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

echo "=== caching_taylor_custom_inplace start $(date +%H:%M:%S) ==="
timeout 9000 env python scripts/bench/bench_caching.py TaylorSeer Custom \
    >$L/caching_taylor_custom_inplace.json 2>$L/caching_taylor_custom_inplace.err
echo "=== caching_taylor_custom_inplace exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor_custom_inplace.json

sleep 20
run e2e_480p_cog_bf16_fullfb2 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_VAE=full BENCH_VAE_FRAME_BATCH=2 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
run e2e_480p_cog_bf16_fullfb4 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_VAE=full BENCH_VAE_FRAME_BATCH=4 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
echo "=== cache_fidelity_r3 start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_CACHE_FIDELITY=1 BENCH_H=60 BENCH_W=52 \
    python scripts/bench/bench_caching.py \
    >$L/cache_fidelity_r3.json 2>$L/cache_fidelity_r3.err
echo "=== cache_fidelity_r3 exit $? $(date +%H:%M:%S) ==="
cat $L/cache_fidelity_r3.json

echo "=== part-13 done $(date +%H:%M:%S) ==="
