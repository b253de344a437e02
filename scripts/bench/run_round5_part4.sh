#!/bin/bash
# Round-5 queue, part 4 (VERDICT r4 next-#7 + NEXT_STEPS capacity item):
# (a) sparge tuner at 1.3B 480P on a STRUCTURED-weight REAL trajectory
#     (10 UniPC steps, captures at 0.1/0.5/0.9) -> per-layer l1 table;
# (b) a measured TPU row with that table threaded (BENCH_SPARGE_TABLE);
# (c) fidelity-ladder int8-sparge rungs incl. bf16-rope quality bound;
# (d) int8+sparge 14B capacity retry with LIGHTX2V_ROPE_BF16=1 (round-4
#     died 674 MB over; bf16 rotation temps are the named fix).
cd /root/repo
L=${BENCH_LOG_DIR:-/tmp/tpu_logs_r5}
mkdir -p $L

while kill -0 $(cat /tmp/part3_r5.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
sleep 120

echo "=== tune_sparge_structured start $(date +%H:%M:%S) ==="
timeout 7200 python -m lightx2v_tpu.tools.tune_sparge --structured \
    --trajectory 10 --capture_fracs 0.1,0.5,0.9 --preset 1.3b \
    --keep_ratio 0.3 --block_q 2048 --block_k 1024 --bar_db 25 \
    --output /tmp/sparge_1.3b_structured.npz \
    >$L/tune_sparge_structured.json 2>$L/tune_sparge_structured.err
echo "=== tune_sparge exit $? $(date +%H:%M:%S) ==="
cat $L/tune_sparge_structured.json
sleep 60

if [ -f /tmp/sparge_1.3b_structured.npz ]; then
  echo "=== fwd_1.3b_sparge_tuned start $(date +%H:%M:%S) ==="
  timeout 3600 env BENCH_PRESET=1.3b BENCH_ATTN=sparge BENCH_STEPS=3 \
      BENCH_SPARGE_TABLE=/tmp/sparge_1.3b_structured.npz \
      python bench.py >$L/fwd_13b_sparge_tuned.json 2>$L/fwd_13b_sparge_tuned.err
  echo "=== exit $? ==="
  cat $L/fwd_13b_sparge_tuned.json
  sleep 60
fi

echo "=== fidelity_int8_sparge start $(date +%H:%M:%S) ==="
timeout 7200 env BENCH_RUNGS=int8-dense,int8-sparge0.3,int8-sparge0.3-bf16rope \
    BENCH_FID_VAE_INT8=0 \
    python scripts/bench/bench_fidelity.py \
    >$L/fidelity_int8_sparge.json 2>$L/fidelity_int8_sparge.err
echo "=== exit $? ==="
cat $L/fidelity_int8_sparge.json
sleep 60

echo "=== fwd_14b_int8_sparge_bf16rope start $(date +%H:%M:%S) ==="
timeout 3600 env BENCH_PRESET=14b BENCH_MM=int8 BENCH_ATTN=sparge \
    BENCH_STEPS=2 LIGHTX2V_ROPE_BF16=1 \
    python bench.py >$L/fwd_14b_int8_sparge_bf16rope.json 2>$L/fwd_14b_int8_sparge_bf16rope.err
echo "=== exit $? ==="
cat $L/fwd_14b_int8_sparge_bf16rope.json
echo "=== part-4 done $(date +%H:%M:%S) ==="
