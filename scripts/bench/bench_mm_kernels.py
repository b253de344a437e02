"""Microbench the quantized-matmul and sparse-attention kernels at the
flagship's 14B shapes, to decompose the denoise step and locate the gap
off the int8-MXU roofline (VERDICT r4: 480P denoise ~6.6 s/step vs a
~3.5-4.5 s kernel-roofline estimate).

Per config: CHAIN calls loop-chained inside ONE jit (per-call dispatch
through the axon tunnel is ~25-30 ms), scalar-fetch sync, TFLOP/s
against the op's algorithmic FLOPs (for sparse attention: both effective
sparse FLOPs and the dense-equivalent rate are printed).

Env: MM_SEQS (default "32760,75600"), MM_CHAIN (default 4),
MM_SWEEP=1 adds a (bm, bn) sweep for the w4a8 fullk path.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

CHAIN = int(os.environ.get("MM_CHAIN", 4))
DIM = 5120
FFN = 13824
HEADS = 40
HEAD_D = 128
GROUP = 512


def main():
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.ops.pallas.w8a8_matmul import (ffn_w4a8, w4a8_matmul,
                                                     w8a8_matmul)
    from lightx2v_tpu.ops.sparge import sparge_attention
    from lightx2v_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)

    def timed(name, fn, *args, flops=0.0, extra=None):
        """fn chains CHAIN applications; returns a scalar."""
        f = jax.jit(fn)
        try:
            t0 = time.perf_counter()
            float(f(*args))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f(*args))
            dt = (time.perf_counter() - t0) / CHAIN
        except Exception as e:  # noqa: BLE001 — print-and-continue bench
            print(json.dumps({"op": name, "error": str(e)[:160]}), flush=True)
            return
        row = {"op": name, "ms": round(dt * 1e3, 2),
               "tflops": round(flops / dt / 1e12, 1),
               "compile_s": round(compile_s, 1)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    def pack_int4(n, k, seed):
        w = jax.random.randint(jax.random.PRNGKey(seed), (n, k // 2), 0, 255,
                               jnp.int32).astype(jnp.uint8)
        ws = jnp.ones((n, k // GROUP), jnp.float32) * 0.01
        return w, ws

    seqs = [int(s) for s in os.environ.get("MM_SEQS", "32760,75600").split(",")]

    if os.environ.get("MM_ONLY") == "blocked":
        # focused probe: force the k-blocked grid on the K=5120 qkvo shape
        # (LIGHTX2V_W4A8_BLOCKED read by the wrapper at trace time) + a
        # bk=512 w8a8 point — testing whether the blocked path's ~93%-of-
        # peak pipelining (K=13824 row) transfers to small K
        os.environ["LIGHTX2V_W4A8_BLOCKED"] = "1"
        for S in seqs:
            x = jax.random.normal(key, (1, S, DIM), jnp.bfloat16) * 0.3
            wq, wqs = pack_int4(DIM, DIM, 1)
            fl = 2.0 * S * DIM * DIM

            def qkv_chain(x, wq=wq, wqs=wqs):
                o = x
                for _ in range(CHAIN):
                    o = w4a8_matmul(o, wq, wqs)
                return jnp.sum(o.astype(jnp.float32))

            timed(f"w4a8blocked[{S}x{DIM}->{DIM}]", qkv_chain, x, flops=fl)

            w8 = jax.random.randint(jax.random.PRNGKey(4), (DIM, DIM), -127,
                                    127, jnp.int32).astype(jnp.int8)
            w8s = jnp.ones((DIM,), jnp.float32) * 0.01

            def w8_chain(x, bk):
                o = x
                for _ in range(CHAIN):
                    o = w8a8_matmul(o, w8, w8s, bk=bk)
                return jnp.sum(o.astype(jnp.float32))

            for bk in (512, 2560):
                timed(f"w8a8bk{bk}[{S}x{DIM}->{DIM}]",
                      lambda xx, bk=bk: w8_chain(xx, bk), x, flops=fl)
        return

    for S in seqs:
        x = jax.random.normal(key, (1, S, DIM), jnp.bfloat16) * 0.3
        xf = jax.random.normal(key, (1, S, FFN), jnp.bfloat16) * 0.3

        # --- w4a8 qkv/o shape: (S, 5120) x (5120 -> 5120), fullk path
        wq, wqs = pack_int4(DIM, DIM, 1)
        fl = 2.0 * S * DIM * DIM  # per call; dt is per-call

        def qkv_chain(x, wq=wq, wqs=wqs, bm=None, bn=None):
            kw = {}
            if bm:
                kw = {"bm": bm, "bn": bn}
            o = x
            for _ in range(CHAIN):
                o = w4a8_matmul(o, wq, wqs, **kw)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"w4a8[{S}x{DIM}->{DIM}]", qkv_chain, x, flops=fl)
        if os.environ.get("MM_SWEEP"):
            for bm in (256, 512, 1024):
                for bn in (512, 1024, 2048):
                    timed(f"w4a8[{S}x{DIM}->{DIM}]bm{bm}bn{bn}",
                          lambda xx, bm=bm, bn=bn: qkv_chain(xx, bm=bm, bn=bn),
                          x, flops=fl)

        # --- w4a8 ffn2 shape: (S, 13824) -> 5120 (blocked path, K > 8192)
        w2, w2s = pack_int4(DIM, FFN, 2)
        fl2 = 2.0 * S * FFN * DIM

        def ffn2_chain(xf):
            # thread the scalar back into the input: identical chained
            # calls get CSE'd by XLA into ONE execution (the original
            # form timed 1 exec against 4 calls' flops — a 4x flattery
            # on top of the flops/dt chain bug; both fixed)
            s = jnp.float32(0)
            for _ in range(CHAIN):
                s = jnp.sum(w4a8_matmul(xf + s * 1e-30, w2, w2s).astype(jnp.float32))
            return s

        timed(f"w4a8[{S}x{FFN}->{DIM}]", ffn2_chain, xf, flops=fl2)

        # --- fused whole FFN (5120 -> 13824 -> gelu -> 5120)
        w0, w0s = pack_int4(FFN, DIM, 3)
        flf = 2.0 * S * DIM * FFN + 2.0 * S * FFN * DIM

        def ffn_chain(x):
            o = x
            for _ in range(CHAIN):
                o = ffn_w4a8(o, w0, w0s, None, w2, w2s, None)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"ffn_w4a8[{S}x{DIM}->{FFN}->{DIM}]", ffn_chain, x, flops=flf)

        # --- int8 w8a8 same qkv shape (2x MXU reference point)
        w8 = jax.random.randint(jax.random.PRNGKey(4), (DIM, DIM), -127, 127,
                                jnp.int32).astype(jnp.int8)
        w8s = jnp.ones((DIM,), jnp.float32) * 0.01

        def w8_chain(x):
            o = x
            for _ in range(CHAIN):
                o = w8a8_matmul(o, w8, w8s)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"w8a8[{S}x{DIM}->{DIM}]", w8_chain, x, flops=fl)

        # --- attention at the self-attn site: sparge 0.3 vs dense flash
        q = jax.random.normal(key, (1, S, HEADS, HEAD_D), jnp.bfloat16) * 0.3
        kk = jax.random.normal(key, (1, S, HEADS, HEAD_D), jnp.bfloat16) * 0.3
        v = jax.random.normal(key, (1, S, HEADS, HEAD_D), jnp.bfloat16)
        dense_fl = 4.0 * S * S * HEADS * HEAD_D

        def sparge_chain(q, kk, v):
            o = q
            for _ in range(CHAIN):
                o = sparge_attention(o, kk, v, keep_ratio=0.3, l1=0.07,
                                     block_q=2048, block_k=1024)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"sparge0.3[{S}]", sparge_chain, q, kk, v, flops=dense_fl * 0.3,
              extra={"dense_equiv_tflops_x": 0.3})

        def flash_chain(q, kk, v):
            o = q
            for _ in range(CHAIN):
                o = flash_attention(o, kk, v, bq=2048, bk=1024)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"flash[{S}]", flash_chain, q, kk, v, flops=dense_fl)


if __name__ == "__main__":
    main()
