#!/bin/bash
# Round-4 queue, part 3: quality-fidelity ladder (VERDICT r3 weak #1),
# Hunyuan/CogVideoX full-scale e2e capability rows (next #5), and a 720P
# decode-tile probe (chunk-2 untiled OOMed at 16.6G; try bigger tiles).
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

# 0. Taylor/Custom full-token retry (part-2 attempt died in the remote
#    compile helper with HTTP 500 — possibly transient tunnel/compile-RAM)
echo "=== caching_taylor_retry start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py TaylorSeer Custom \
    >$L/caching_taylor.json 2>$L/caching_taylor.err
echo "=== caching_taylor_retry exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor.json
# fallback protocol if the full-token compile keeps killing the remote
# compile helper: HALF 480P tokens (60x52), fp8 cache, own B=1 baseline
if grep -q '"error"' $L/caching_taylor.json; then
  echo "=== caching_taylor_half start $(date +%H:%M:%S) ==="
  timeout 7200 env BENCH_H=60 BENCH_W=52 python scripts/bench/bench_caching.py \
      TaylorSeer Custom >$L/caching_taylor_half.json 2>$L/caching_taylor_half.err
  echo "=== caching_taylor_half exit $? $(date +%H:%M:%S) ==="
  cat $L/caching_taylor_half.json
fi

# 1. fidelity ladder at 1.3B, FULL 480P tokens, shared master weights
echo "=== fidelity start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_fidelity.py >$L/fidelity.json 2>$L/fidelity.err
echo "=== fidelity exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity.json

# 1b. 720P decode probes: untiled chunk-1 (chunk-2 OOMed at 16.6 GB),
#     then bigger tiles after release (less redundant halo conv work)
run e2e_720p_rel_full1 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 \
    BENCH_VAE=full BENCH_VAE_CHUNK=1 BENCH_STEPS=2
run e2e_720p_rel_tiled64 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 \
    BENCH_VAE_TILE=64 BENCH_VAE_STRIDE=56 BENCH_STEPS=2
run e2e_720p_rel_tiled48 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 \
    BENCH_VAE_TILE=48 BENCH_VAE_STRIDE=40 BENCH_STEPS=2

# 1c. int8 weights + sparge flagship probe (round-3 recorded OOM with the
#     resident-VAE protocol; decode-after-release changes the peak)
run e2e_480p_rel_full4_int8sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

# 2. family e2e capability rows (full scale)
# hunyuan int8 is 12.7 GB of weights -> forward OOMed in part 2 (program
# needs 3.44 GB beside them); w4a8 (6.4 GB) is the capacity scheme
run fwd_480p_hunyuan_w4a8 BENCH_MODEL=hunyuan BENCH_MM=int4a8 BENCH_STEPS=2
run e2e_480p_hunyuan_w4a8 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4
run e2e_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

echo "=== part-3 done $(date +%H:%M:%S) ==="
