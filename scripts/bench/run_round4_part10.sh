#!/bin/bash
# Round-4 queue, part 10: the two part-8 OOMs, root-caused and fixed —
#  * int8-weights + sparge: apply_rope/apply_rope_half no longer keep
#    full-width f32 q/k slabs (2 x 640 MB HLO temps at 14B 480P — the
#    exact 1.31 GB the compile was over by),
#  * CogVideoX e2e: decode now frame-batches each tile with conv caches
#    (the reference's own num_latent_frames_batch_size=2 loop) instead of
#    whole-clip tile programs (23 GB of 81-frame f32 maps).
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

# flagship candidate: int8 denoise is ~15% faster than w4a8
run e2e_480p_rel_full4_int8sparge_r3 BENCH_MODE=e2e BENCH_PRESET=14b BENCH_MM=int8 \
    BENCH_ATTN=sparge BENCH_E2E_SPLIT=1 BENCH_VAE=full BENCH_VAE_CHUNK=4 BENCH_STEPS=2

sleep 20
# CogVideoX capability row: tiled + frame-batched decode
run e2e_480p_cog_bf16_r3 BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_STEPS=2 BENCH_INFER_STEPS=4

sleep 20
# probe: full-frame chunked decode (no spatial tiling -> no halo redundancy)
run e2e_480p_cog_bf16_fullchunk BENCH_MODEL=cogvideox BENCH_MODE=e2e \
    BENCH_VAE=full BENCH_STEPS=2 BENCH_INFER_STEPS=4

echo "=== part-10 done $(date +%H:%M:%S) ==="
