"""Sweep flash-attention tile sizes over sequence lengths on real TPU.

VERDICT r2 #8: the 4096x2048 clamps were tuned at 32k single-chip; under
sequence parallelism the per-device S shrinks (75600/8 ~ 9.4k, 32760/4 ~
8.2k) and hits different VMEM/grid regimes. This sweep times the kernel
at S in {4k, 8k, 16k, 32k, 75.6k} x candidate (bq, bk) pairs and prints
a JSON table to bake into ops/pallas/flash_attention.TILE_TABLE.

Infra notes honored (NEXT_STEPS): each config loop-chains CHAIN=8
kernel calls inside ONE jit (per-call dispatch through the axon tunnel
is ~25-30 ms and would swamp sub-100ms kernels); sync via scalar fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

CHAIN = 8


def main():
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.ops.pallas.flash_attention import flash_attention

    heads = int(os.environ.get("TILE_HEADS", 12))
    d = int(os.environ.get("TILE_D", 128))
    seqs = [int(x) for x in os.environ.get(
        "TILE_SEQS", "4096,8192,16384,32768,75600").split(",")]
    cands = [(1024, 512), (1024, 1024), (2048, 1024), (2048, 2048),
             (4096, 1024), (4096, 2048), (4096, 4096)]

    table = {}
    for s in seqs:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (1, s, heads, d), jnp.bfloat16) * 0.3
        k = jax.random.normal(key, (1, s, heads, d), jnp.bfloat16) * 0.3
        v = jax.random.normal(key, (1, s, heads, d), jnp.bfloat16)
        flops = 4.0 * s * s * heads * d  # 2 matmuls, fwd only
        best = None
        for bq, bk in cands:
            if bq > s or bk > s:
                continue

            def chain(q, k, v, bq=bq, bk=bk):
                o = q
                for _ in range(CHAIN):
                    o = flash_attention(o, k, v, bq=bq, bk=bk)
                return jnp.sum(o.astype(jnp.float32))

            f = jax.jit(chain)
            try:
                float(f(q, k, v))  # compile + warm
                t0 = time.perf_counter()
                float(f(q, k, v))
                dt = (time.perf_counter() - t0) / CHAIN
            except Exception as e:
                print(json.dumps({"s": s, "bq": bq, "bk": bk,
                                  "error": str(e)[:120]}), flush=True)
                continue
            tflops = flops / dt / 1e12
            print(json.dumps({"s": s, "bq": bq, "bk": bk,
                              "ms": round(dt * 1e3, 2),
                              "tflops": round(tflops, 1)}), flush=True)
            if best is None or dt < best[0]:
                best = (dt, bq, bk)
        if best:
            table[s] = {"bq": best[1], "bk": best[2],
                        "tflops": round(flops / best[0] / 1e12, 1)}
    print("TILE_TABLE:", json.dumps(table))


if __name__ == "__main__":
    main()
