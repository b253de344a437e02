#!/bin/bash
# Round-5 queue, part 2: retry the 720P 14B Tea@sparge caching row
# (part-1's attempt hit the remote-compile-helper HTTP 500 twice ~33 s
# into each process — same transient class as round-4 part-14/15, which
# succeeded on retry with 120 s spacing). 3 tries, 180 s spacing.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

sleep 30
for i in 1 2 3; do
  echo "=== caching_14b_720p_r$i start $(date +%H:%M:%S) ==="
  timeout 14400 env BENCH_ARCH_PRESET=wan2.1_14b BENCH_SCHEME=int4 \
      BENCH_MM_TYPE=W-int4-group-sym-A-int8-token-dynamic-Tpu \
      BENCH_SELF_ATTN=sparge BENCH_INFER_STEPS=40 \
      BENCH_H=90 BENCH_W=160 BENCH_TEA_CALC_FRAC=0.35 \
      python scripts/bench/bench_caching.py NoCaching Tea \
      >$L/caching_14b_720p_r$i.json 2>$L/caching_14b_720p_r$i.err
  echo "=== caching_14b_720p_r$i exit $? $(date +%H:%M:%S) ==="
  cat $L/caching_14b_720p_r$i.json
  grep -q '"seconds"' $L/caching_14b_720p_r$i.json && break
  sleep 180
done
echo "=== part-2 done $(date +%H:%M:%S) ==="
