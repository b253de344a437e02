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

# 1. fidelity ladder at 1.3B, FULL 480P tokens, shared master weights
echo "=== fidelity start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/bench/bench_fidelity.py >$L/fidelity.json 2>$L/fidelity.err
echo "=== fidelity exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity.json

# 2. family e2e capability rows (full scale)
run e2e_480p_hunyuan_int8 BENCH_MODEL=hunyuan BENCH_MODE=e2e BENCH_MM=int8 \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4
run e2e_480p_cog_bf16 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

echo "=== part-3 done $(date +%H:%M:%S) ==="
