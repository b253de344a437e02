#!/bin/bash
# Round-4 queue, part 14:
# (a) FULL-token Taylor + Custom caching rows via the instrumented
#     isolated runner (AOT-compiled split-branch programs peak at
#     12.4 GiB by analysis; each mode gets a fresh process so a failure
#     can't starve the next mode — parts 12/13 post-mortem);
# (b) CogVideoX levers, separately attributed: int8 block linears
#     (denoise 16.2 s at bf16) and overlap-0.125 tiling (decode 20.8 s
#     at overlap 0.25 = 1.78x redundancy -> 1.31x), then the combined
#     config if both win.
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

echo "=== taylor_fulltoken start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_taylor_fulltoken.py TaylorSeer \
    >$L/taylor_fulltoken.json 2>$L/taylor_fulltoken.err
echo "=== taylor_fulltoken exit $? $(date +%H:%M:%S) ==="
cat $L/taylor_fulltoken.json

sleep 20
# reuse Taylor's measured B=1 baseline if it printed one
B1=$(grep -o '"b1_nocache_baseline_s": [0-9.]*' $L/taylor_fulltoken.json | grep -o '[0-9.]*$' | head -1)
echo "=== custom_fulltoken start $(date +%H:%M:%S) (B1=$B1) ==="
timeout 7200 env ${B1:+BENCH_BASE_B1_S=$B1} \
    python scripts/bench/bench_taylor_fulltoken.py Custom \
    >$L/custom_fulltoken.json 2>$L/custom_fulltoken.err
echo "=== custom_fulltoken exit $? $(date +%H:%M:%S) ==="
cat $L/custom_fulltoken.json

sleep 20
run e2e_480p_cog_int8 BENCH_MODEL=cogvideox BENCH_MODE=e2e BENCH_MM=int8 \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
run e2e_480p_cog_bf16_ov125 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_VAE_OVERLAP=0.125 BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
run e2e_480p_cog_int8_ov125 BENCH_MODEL=cogvideox BENCH_MODE=e2e BENCH_MM=int8 \
    BENCH_VAE_OVERLAP=0.125 BENCH_STEPS=2 BENCH_INFER_STEPS=4

echo "=== part-14 done $(date +%H:%M:%S) ==="
