#!/bin/bash
# Round-4 queue, part 15: Custom full-token retry (part-14's attempt hit
# a transient tunnel error — "response body closed" during param-synth
# compile, 20 s after the previous process exited; the same transient
# class likely explains part-13's 70-second "RESOURCE_EXHAUSTED").
# Waits for part-14 to finish, then retries with 120 s spacing, 3 tries.
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r4}

while kill -0 $(cat /tmp/part14.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

B1=$(grep -o '"b1_nocache_baseline_s": [0-9.]*' $L/taylor_fulltoken.json | grep -o '[0-9.]*$' | head -1)
for i in 1 2 3; do
  echo "=== custom_fulltoken_r$i start $(date +%H:%M:%S) (B1=$B1) ==="
  timeout 7200 env ${B1:+BENCH_BASE_B1_S=$B1} \
      python scripts/bench/bench_taylor_fulltoken.py Custom \
      >$L/custom_fulltoken_r$i.json 2>$L/custom_fulltoken_r$i.err
  rc=$?
  echo "=== custom_fulltoken_r$i exit $rc $(date +%H:%M:%S) ==="
  cat $L/custom_fulltoken_r$i.json
  grep -q '"mode"' $L/custom_fulltoken_r$i.json && break
  sleep 120
done
echo "=== part-15 done $(date +%H:%M:%S) ==="
