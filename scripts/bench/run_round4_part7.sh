#!/bin/bash
# Round-4 queue, part 7: retries with this round's fixes —
#  * hunyuan e2e (tile_jit per-tile decode programs; the one-program tile
#    grid OOMed at 46.85 GB),
#  * Taylor/Custom FULL-token (cache arg donation halves step-program I/O),
#  * flagship e2e rows with int8 VAE decoder convs (BENCH_VAE_INT8=1).
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

run e2e_480p_hunyuan_w4a8_r2 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int4a8 \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
echo "=== caching_taylor_donate start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py TaylorSeer Custom \
    >$L/caching_taylor_donate.json 2>$L/caching_taylor_donate.err
echo "=== caching_taylor_donate exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor_donate.json
if grep -q '"error"' $L/caching_taylor_donate.json || ! grep -q '"mode".*seconds' $L/caching_taylor_donate.json; then
  sleep 20
  echo "=== caching_taylor_half_donate start $(date +%H:%M:%S) ==="
  timeout 7200 env BENCH_H=60 BENCH_W=52 python scripts/bench/bench_caching.py \
      TaylorSeer Custom >$L/caching_taylor_half_donate.json 2>$L/caching_taylor_half_donate.err
  echo "=== caching_taylor_half_donate exit $? $(date +%H:%M:%S) ==="
  cat $L/caching_taylor_half_donate.json
fi

# flagship + int8 VAE decode (quality bound: fidelity vae-int8 rung)
run e2e_480p_rel_full4_int8vae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 \
    BENCH_VAE_INT8=1 BENCH_STEPS=2
run e2e_720p_rel_full1_int8vae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 \
    BENCH_VAE=full BENCH_VAE_CHUNK=1 BENCH_VAE_INT8=1 BENCH_STEPS=2

echo "=== part-7 done $(date +%H:%M:%S) ==="
