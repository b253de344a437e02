#!/bin/bash
# Round-5 queue, part 3 (VERDICT r4 next-#3/#4/#5):
# (a) 720P 14B Tea@sparge at the B=1 protocol — the B=2 CFG step program
#     deterministically kills the remote compile helper at 720P (parts
#     1-2, HTTP 500 on NoCaching AND Tea; the B=1 720P e2e compiled fine
#     in round 4), so the row runs CFG-free vs its own B=1 baseline.
# (b) Protocol-complete Hunyuan e2e: llama-8B(int8)+CLIP-L encode inside
#     the timed run (heaviest reference encoder stack), w4a8 DiT,
#     t_tile=4 decode.
# (c) CogVideoX attack: int8 denoise (the last bf16 family row) +
#     T5-v1.1 encode included + chunked full-frame decode; frame_batch=4
#     and overlap-0.125 tiled probes for the decode half.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part2_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 7200 env "$@" python bench.py >$L/$name.json 2>$L/$name.err
  echo "=== $name exit $? $(date +%H:%M:%S) ==="
  cat $L/$name.json
  sleep 60
}

echo "=== caching_14b_720p_b1 start $(date +%H:%M:%S) ==="
timeout 14400 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
    python scripts/bench/bench_caching.py NoCaching Tea \
    >$L/caching_14b_720p_b1.json 2>$L/caching_14b_720p_b1.err
echo "=== caching_14b_720p_b1 exit $? $(date +%H:%M:%S) ==="
cat $L/caching_14b_720p_b1.json
sleep 60

run e2e_480p_hunyuan_protocol BENCH_MODEL=hunyuan BENCH_MODE=e2e \
    BENCH_INCLUDE_ENCODE=1 BENCH_MM=int4a8 BENCH_VAE=ttile \
    BENCH_VAE_TTILE=4 BENCH_STEPS=2

run e2e_480p_cog_protocol_int8 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_INCLUDE_ENCODE=1 BENCH_MM=int8 BENCH_VAE=full \
    BENCH_VAE_FRAME_BATCH=2 BENCH_STEPS=2

run e2e_480p_cog_int8_fb4 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_MM=int8 BENCH_VAE=full BENCH_VAE_FRAME_BATCH=4 BENCH_STEPS=2

run e2e_480p_cog_int8_ov0125 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_MM=int8 BENCH_VAE=tiled BENCH_VAE_TILE=32 \
    BENCH_VAE_OVERLAP=0.125 BENCH_VAE_FRAME_BATCH=2 BENCH_STEPS=2

echo "=== part-3 done $(date +%H:%M:%S) ==="
