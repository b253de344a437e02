#!/bin/bash
# Sequential TPU bench queue (round 3), VERDICT-priority order:
# flagship e2e beat (#2) -> caching honesty (#4) -> 720P story (#7) ->
# protocol/variant rows. One job at a time; each logs to its own file.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs}
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 3600 env "$@" python bench.py >$L/$name.json 2>$L/$name.err
  echo "=== $name exit $? $(date +%H:%M:%S) ==="
  cat $L/$name.json
}

# 0. sanity (also proves strict kernel dispatch)
run tiny BENCH_PRESET=tiny

# 1. flagship e2e, 480P, w4a8 + sparge (VERDICT #2: target <= 35 s)
run e2e_480p_w4a8_sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_STEPS=2
# 1b. untiled full-frame VAE decode (1.78x less conv work if it fits)
run e2e_480p_w4a8_sparge_fullvae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_STEPS=2

# 2. caching re-measure (VERDICT #4): Ada calibrated, Taylor/Custom at
# FULL 480P tokens with fp8 cache entries
echo "=== caching re-measure start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py \
    >$L/caching.json 2>$L/caching.err
echo "=== caching exit $? $(date +%H:%M:%S) ==="
cat $L/caching.json

# 3. 720P story (VERDICT #7): e2e (untiled chunk=2 first, tiled fallback)
run e2e_720p_w4a8_sparge_fullvae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 BENCH_STEPS=2 \
    BENCH_VAE=full BENCH_VAE_CHUNK=2
run e2e_720p_w4a8_sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 BENCH_STEPS=2
# 720P 14B forwards (reference LightX2V_3: 8388 ms/forward H200)
run fwd_720p_14b_w4a8_sparge BENCH_PRESET=14b BENCH_MM=int4a8 BENCH_ATTN=sparge \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2
run fwd_720p_14b_w4a8 BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 4. protocol/variant rows
run e2e_480p_w4a8_sparge_i2v BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_TASK=i2v BENCH_E2E_SPLIT=1 BENCH_STEPS=2
run e2e_480p_w4a8_sparge_ropefused BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_ROPE_FUSED=1 BENCH_STEPS=2
run fwd_480p_14b_w4a8_sparge_i2v BENCH_PRESET=14b BENCH_MM=int4a8 BENCH_ATTN=sparge \
    BENCH_TASK=i2v BENCH_STEPS=2
run fwd_720p_13b_bf16 BENCH_PRESET=1.3b BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 5. other model families at real scale
run fwd_480p_hunyuan_int8 BENCH_MODEL=hunyuan BENCH_MM=int8 BENCH_STEPS=2
run fwd_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_STEPS=2

echo "=== queue done $(date +%H:%M:%S) ==="
