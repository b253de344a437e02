#!/bin/bash
# Round-4 queue, part 5 (fresh VM): everything parts 3/4 left unmeasured —
# fidelity ladder (VERDICT r3 weak #1), Taylor/Custom caching (full-token
# retry on the fresh tunnel, half-token fallback), Hunyuan/CogVideoX
# family capability rows, and the int8+sparge flagship probe.
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

# 1. fidelity ladder at 1.3B, FULL 480P tokens, shared master weights
echo "=== fidelity start $(date +%H:%M:%S) ==="
timeout 10800 python scripts/bench/bench_fidelity.py >$L/fidelity.json 2>$L/fidelity.err
echo "=== fidelity exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity.json

# 2. Taylor/Custom full-token retry (part-2/3 attempts died in the remote
#    compile helper with HTTP 500; fresh VM + fresh tunnel — try once more)
sleep 20
echo "=== caching_taylor start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py TaylorSeer Custom \
    >$L/caching_taylor.json 2>$L/caching_taylor.err
echo "=== caching_taylor exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor.json
if grep -q '"error"' $L/caching_taylor.json || ! grep -q '"mode"' $L/caching_taylor.json; then
  sleep 20
  echo "=== caching_taylor_half start $(date +%H:%M:%S) ==="
  timeout 7200 env BENCH_H=60 BENCH_W=52 python scripts/bench/bench_caching.py \
      NoCaching TaylorSeer Custom >$L/caching_taylor_half.json 2>$L/caching_taylor_half.err
  echo "=== caching_taylor_half exit $? $(date +%H:%M:%S) ==="
  cat $L/caching_taylor_half.json
fi

# 3. family e2e capability rows (full scale)
run fwd_480p_hunyuan_w4a8 BENCH_MODEL=hunyuan BENCH_MM=int4a8 BENCH_STEPS=2
run e2e_480p_hunyuan_w4a8 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4
run e2e_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

# 4. int8 weights + sparge flagship probe (round-3 OOM was resident-VAE;
#    part-3 retry hit the compile-helper 500 — try on the fresh tunnel)
run e2e_480p_rel_full4_int8sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

echo "=== part-5 done $(date +%H:%M:%S) ==="
