#!/bin/bash
# Sequential TPU bench queue (round 3). One job at a time — the axon
# tunnel serializes everything anyway. Each job logs to its own file.
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

# 0. sanity
run tiny BENCH_PRESET=tiny

# 1. flagship e2e, 480P, w4a8 + sparge, tiled VAE chunk=4, split timing
run e2e_480p_w4a8_sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_STEPS=2

# 2. same but untiled full-frame VAE decode (1.78x less conv work if it fits)
run e2e_480p_w4a8_sparge_fullvae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_STEPS=2

# 1b. flagship e2e with fused rope forced onto the w4a8 path (opt-in)
run e2e_480p_w4a8_sparge_ropefused BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_ROPE_FUSED=1 BENCH_STEPS=2

# 2b. i2v-protocol flagship e2e (the reference's 14 s row is I2V-14B)
run e2e_480p_w4a8_sparge_i2v BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_TASK=i2v BENCH_E2E_SPLIT=1 BENCH_STEPS=2

# 3. 720P e2e distill (reference 44 s H200 row); try the untiled decode
# first (1.78x less conv work; chunk=2 bounds full-res activations), fall
# back to tiled
run e2e_720p_w4a8_sparge_fullvae BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 BENCH_STEPS=2 \
    BENCH_VAE=full BENCH_VAE_CHUNK=2
run e2e_720p_w4a8_sparge BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 4. 720P 14B forward rows (reference LightX2V_3: 8388 ms/forward H200)
run fwd_720p_14b_w4a8_sparge BENCH_PRESET=14b BENCH_MM=int4a8 BENCH_ATTN=sparge \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2
run fwd_720p_14b_w4a8 BENCH_PRESET=14b BENCH_MM=int4a8 \
    BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 4b. i2v-protocol 480P forward (the reference's headline rows are I2V)
run fwd_480p_14b_w4a8_sparge_i2v BENCH_PRESET=14b BENCH_MM=int4a8 BENCH_ATTN=sparge \
    BENCH_TASK=i2v BENCH_STEPS=2

# 5. 720P 1.3B forward (no H200 row; completes the 720P table)
run fwd_720p_13b_bf16 BENCH_PRESET=1.3b BENCH_H=90 BENCH_W=160 BENCH_STEPS=2

# 6. HunyuanVideo MMDiT int8 forward at 480P tokens (second model family)
run fwd_480p_hunyuan_int8 BENCH_MODEL=hunyuan BENCH_MM=int8 BENCH_STEPS=2

# 7. CogVideoX1.5-5B bf16 forward at 480P tokens (third model family)
run fwd_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_STEPS=2

echo "=== caching re-measure start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_caching.py \
    >$L/caching.json 2>$L/caching.err
echo "=== caching exit $? $(date +%H:%M:%S) ==="
cat $L/caching.json
echo "=== queue done $(date +%H:%M:%S) ==="
