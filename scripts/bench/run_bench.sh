#!/bin/bash
# DiT-step benchmark sweep (reference: scripts/bench/run_lightx2v_{1..6}.sh).
for attn in flash_attn3 sage_attn2 xla_chunked; do
    echo "=== attention: $attn ==="
    BENCH_ATTN=$attn python bench.py
done
