#!/bin/bash
# Round-4 queue, part 2: the 720P story (VERDICT r3 missing #1), the i2v
# protocol row, and full-token caching re-measure (missing #2).
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

# 1. 720P e2e vs the 44 s H200 distill row (full decode after release,
#    chunk=2 first; tiled fallback)
run e2e_720p_rel_full2 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 \
    BENCH_VAE=full BENCH_VAE_CHUNK=2 BENCH_STEPS=2
run e2e_720p_rel_tiled4 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 2. 720P 14B forwards (reference LightX2V_3: 8388 ms/forward H200)
run fwd_720p_14b_w4a8_sparge BENCH_PRESET=14b BENCH_MM=int4a8 BENCH_ATTN=sparge \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2
run fwd_720p_14b_w4a8 BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 3. i2v protocol rows (reference headline table is I2V)
run e2e_480p_rel_full4_i2v BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_TASK=i2v BENCH_E2E_SPLIT=1 \
    BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

# 4. caching at FULL 480P tokens (fp8 Taylor entries, calibrated Ada)
echo "=== caching start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py >$L/caching.json 2>$L/caching.err
echo "=== caching exit $? $(date +%H:%M:%S) ==="
cat $L/caching.json

# 5. other model families at real scale (forward rows)
run fwd_480p_hunyuan_int8 BENCH_MODEL=hunyuan BENCH_MM=int8 BENCH_STEPS=2
run fwd_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_STEPS=2

echo "=== part-2 done $(date +%H:%M:%S) ==="
