#!/bin/bash
# DiT-step benchmark sweep (reference: scripts/bench/run_lightx2v_{1..6}.sh).
# Preset/mode pinned explicitly so the sweep stays a 1.3B forward sweep even
# if the bare-default flagship row changes again.
for attn in flash_attn3 sage_attn2 xla_chunked; do
    echo "=== attention: $attn ==="
    BENCH_PRESET=1.3b BENCH_MODE=forward BENCH_ATTN=$attn python bench.py
done
