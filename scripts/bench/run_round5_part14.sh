#!/bin/bash
# Round-5 queue, part 14 — causvid bf16 retry with donated cache; if the
# 21-frame window still OOMs, a 14-frame (2-block) fallback row.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L
while kill -0 $(cat /tmp/part13_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120
echo "=== causvid_13b_r2 start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_PRESET=1.3b BENCH_MM=bf16 BENCH_STEPS=2 \
    python scripts/bench/bench_causvid.py \
    >$L/causvid_13b_r2.json 2>$L/causvid_13b_r2.err
rc=$?
echo "=== exit $rc $(date +%H:%M:%S) ==="
cat $L/causvid_13b_r2.json
if [ ! -s $L/causvid_13b_r2.json ]; then
  sleep 120
  echo "=== causvid_13b_14f start $(date +%H:%M:%S) ==="
  timeout 7200 env BENCH_PRESET=1.3b BENCH_MM=bf16 BENCH_STEPS=2 \
      CAUSVID_FRAMES=14 python scripts/bench/bench_causvid.py \
      >$L/causvid_13b_14f.json 2>$L/causvid_13b_14f.err
  echo "=== exit $? $(date +%H:%M:%S) ==="
  cat $L/causvid_13b_14f.json
fi
echo "=== part-14 done $(date +%H:%M:%S) ==="
