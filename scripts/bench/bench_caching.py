"""Measure feature-caching speedups on real TPU at the reference's protocol:
Wan2.1-T2V-1.3B, 480P 5s, 50 UniPC steps, CFG on (cache_source.md:15-100;
reference results on H200: TeaCache 3.24x, TaylorSeer 1.39x, AdaCache 2.73x).

Weights are synthesized on device (see models/wan/weights.py). CAVEAT
recorded with the results: Tea/Ada decisions are data-dependent — with
random weights the embedding dynamics differ from a trained checkpoint, so
thresholds were validated to produce skip rates in the reference's
published range (TeaCache 0.26 ~2/3 skipped) before timing.

Usage: python scripts/bench/bench_caching.py [modes...]   (default: all)
Emits one JSON line per mode with seconds + speedup vs NoCaching.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.config import PRESETS, WanArch
    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device
    from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    arch = WanArch(**PRESETS["wan2.1_1.3b"], in_dim=16, out_dim=16,
                   freq_dim=256, text_len=512, text_dim=4096)
    target = (16, int(os.environ.get("BENCH_FRAMES", 21)),
              int(os.environ.get("BENCH_H", 60)), int(os.environ.get("BENCH_W", 104)))
    steps = int(os.environ.get("BENCH_INFER_STEPS", 50))
    repeats = int(os.environ.get("BENCH_REPEATS", 1))

    params = init_random_params_on_device(arch, scheme="bf16", seed=0)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)
    ctx_null = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)

    modes = sys.argv[1:] or ["NoCaching", "Tea", "TaylorSeer", "Ada", "Custom"]
    base_s = None
    results = {}
    for mode in modes:
        cfg = ConfigDict(infer_steps=steps, sample_shift=5.0,
                         teacache_thresh=float(os.environ.get("BENCH_TEA_THRESH", 0.26)),
                         use_ret_steps=False)
        sched = WanUniPCScheduler(cfg)
        state0 = sched.prepare(target, seed=42)
        denoise = make_denoise_fn(
            arch, sched, target, enable_cfg=True, guide_scale=5.0,
            mm_type="Default", self_attn_type="flash_attn3",
            cross_attn_type="flash_attn3", feature_caching=mode, caching_config=cfg,
        )

        # host-stepped loop: one device execution PER STEP. A whole-run
        # scan is a single ~160 s device call at 50 steps, which exceeds
        # the axon tunnel's per-execute deadline (observed ABORTED/worker
        # crash); per-step dispatch overhead is ~25 ms against ~3 s steps.
        step_fn = jax.jit(denoise.one_step)

        def once():
            st, cache = state0, denoise.init_cache()
            for _ in range(steps):
                st, cache = step_fn(params, st, cache, ctx, ctx_null, None, None)
            return float(jnp.sum(st["latents"].astype(jnp.float32)))

        t0 = time.perf_counter()
        once()  # compile + first run
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        sec = float(np.median(times))
        if mode == "NoCaching":
            base_s = sec
        results[mode] = sec
        print(json.dumps({
            "mode": mode, "seconds": round(sec, 2),
            "compile_s": round(compile_s, 1),
            "speedup_vs_nocache": round(base_s / sec, 3) if base_s else None,
            "steps": steps, "shape": target,
        }), flush=True)


if __name__ == "__main__":
    main()
