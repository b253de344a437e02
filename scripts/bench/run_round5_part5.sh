#!/bin/bash
# Round-5 queue, part 5 — retries with the two capacity fixes landed in
# 397d109:
# (a) 720P 14B B=1 Tea via SPLIT-BRANCH (trace-time calc/skip programs;
#     the dual-branch lax.cond RESOURCE_EXHAUSTED in part 3 while the
#     B=1 NoCaching baseline ran at 871.8 s). Baseline injected so the
#     ~17 min baseline compile isn't repeated; fp8 residual cache as the
#     fallback rung if bf16 still doesn't fit.
# (b) Hunyuan protocol-complete e2e with the w4a8 (nibble-packed int4)
#     synthetic Llama — int8's 8 GB encoder + 13B w4a8 DiT overflowed
#     HBM in part 3; w4a8 halves the encoder to ~4.3 GB.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part4_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== tea_720p_split start $(date +%H:%M:%S) ==="
timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
    BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
    BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
    BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
    BENCH_BASE_B1_S=871.8 \
    python scripts/bench/bench_caching.py Tea \
    >$L/tea_720p_split.json 2>$L/tea_720p_split.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/tea_720p_split.json
sleep 120

if grep -q '"error"' $L/tea_720p_split.json; then
  echo "=== tea_720p_split_fp8 start $(date +%H:%M:%S) ==="
  timeout 10800 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
      BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
      BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 BENCH_ENABLE_CFG=0 \
      BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
      BENCH_BASE_B1_S=871.8 BENCH_TEA_CACHE_DTYPE=fp8 \
      python scripts/bench/bench_caching.py Tea \
      >$L/tea_720p_split_fp8.json 2>$L/tea_720p_split_fp8.err
  echo "=== exit $? $(date +%H:%M:%S) ==="
  cat $L/tea_720p_split_fp8.json
  sleep 120
fi

echo "=== e2e_480p_hunyuan_protocol_w4a8llama start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_MODEL=hunyuan BENCH_MODE=e2e \
    BENCH_INCLUDE_ENCODE=1 BENCH_MM=int4a8 BENCH_VAE=ttile \
    BENCH_VAE_TTILE=4 BENCH_STEPS=2 BENCH_LLAMA_SCHEME=w4a8 \
    python bench.py \
    >$L/e2e_480p_hunyuan_protocol_w4a8llama.json 2>$L/e2e_480p_hunyuan_protocol_w4a8llama.err
echo "=== exit $? $(date +%H:%M:%S) ==="
cat $L/e2e_480p_hunyuan_protocol_w4a8llama.json
echo "=== part-5 done $(date +%H:%M:%S) ==="
