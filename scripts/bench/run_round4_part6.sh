#!/bin/bash
# Round-4 queue, part 6: sparge-isolated fidelity columns — re-run the
# sparse rungs with the vs-w4a8-dense second reference (added after the
# part-5 ladder showed sparse rungs identical to w4a8-dense at 0.01 dB
# resolution; this measures the sparsity-only error directly).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r4}
mkdir -p $L

echo "=== fidelity_sparge start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_RUNGS=w4a8-dense,w4a8-sparge0.5,w4a8-sparge0.3,w4a8-sparge0.3-ropefused \
    python scripts/bench/bench_fidelity.py >$L/fidelity_sparge.json 2>$L/fidelity_sparge.err
echo "=== fidelity_sparge exit $? $(date +%H:%M:%S) ==="
cat $L/fidelity_sparge.json
echo "=== part-6 done $(date +%H:%M:%S) ==="
