#!/bin/bash
# Round-4 queue, part 4: re-runs of the part-3 failures — fidelity ladder
# (sys.path bug fixed) and Taylor/Custom at HALF 480P tokens (the
# full-token compile hard-kills the remote compile helper; the immediate
# half-token retry then hit leftover device allocations, so jobs here are
# spaced out).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r4}
mkdir -p $L

sleep 20
echo "=== fidelity start $(date +%H:%M:%S) ==="
timeout 10800 python scripts/bench/bench_fidelity.py >$L/fidelity.json 2>$L/fidelity.err
echo "=== fidelity exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity.json

sleep 20
echo "=== caching_taylor_half start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_H=60 BENCH_W=52 python scripts/bench/bench_caching.py \
    TaylorSeer Custom >$L/caching_taylor_half.json 2>$L/caching_taylor_half.err
echo "=== caching_taylor_half exit $? $(date +%H:%M:%S) ==="
cat $L/caching_taylor_half.json

echo "=== part-4 done $(date +%H:%M:%S) ==="
