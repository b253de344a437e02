"""Minimal instrumented runner for the FULL-token Taylor-family caching rows.

The general bench_caching harness hit two failure layers on this row
(BENCHLOG_r04 parts 2/5/7/12/13): first the remote compile helper died on
the dual-branch cond program (fixed: split-branch host scheduling), then
runtime RESOURCE_EXHAUSTED even though AOT analysis of the fixed programs
shows a 12.4 GiB peak on a 15.75 GiB v5e (probe_taylor_memory.py). This
runner strips the harness to the essentials and prints device memory
stats between phases so any failure localizes itself:

  synth params -> init fp8 cache -> AOT-compile calc/skip -> host-step the
  static schedule (donated cache) -> time repeat runs -> B=1 NoCaching
  baseline (or BENCH_BASE_B1_S) -> one JSON row.

Usage: python scripts/bench/bench_taylor_fulltoken.py [TaylorSeer|Custom]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def mem(tag):
    import jax
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        row = {"mem_" + tag: {k: round(v / 2**30, 2) for k, v in s.items()
                              if k in ("bytes_in_use", "peak_bytes_in_use",
                                       "bytes_limit", "largest_free_block_bytes")}}
    except Exception as e:
        row = {"mem_" + tag: f"unavailable: {str(e)[:80]}"}
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.config import PRESETS, WanArch
    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device
    from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    mode = (sys.argv[1:] or ["TaylorSeer"])[0]
    preset = os.environ.get("BENCH_ARCH_PRESET", "wan2.1_1.3b")
    arch = WanArch(**PRESETS[preset], in_dim=16, out_dim=16,
                   freq_dim=256, text_len=512, text_dim=4096)
    target = (16, int(os.environ.get("BENCH_FRAMES", 21)),
              int(os.environ.get("BENCH_H", 60)), int(os.environ.get("BENCH_W", 104)))
    steps = int(os.environ.get("BENCH_INFER_STEPS", 50))
    repeats = int(os.environ.get("BENCH_REPEATS", 1))

    mem("start")
    params = init_random_params_on_device(arch, scheme="bf16", seed=0)
    jax.block_until_ready(params)
    mem("params")

    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1,
                      jnp.bfloat16)
    ctx_null = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1,
                           jnp.bfloat16)

    cfg = ConfigDict(infer_steps=steps, sample_shift=5.0,
                     taylor_cache_dtype="fp8", teacache_thresh=0.26,
                     use_ret_steps=False)
    sched = WanUniPCScheduler(cfg)
    state0 = sched.prepare(target, seed=42)
    denoise = make_denoise_fn(arch, sched, target, enable_cfg=False,
                              guide_scale=5.0, mm_type="Default",
                              self_attn_type="flash_attn3",
                              cross_attn_type="flash_attn3",
                              feature_caching=mode, caching_config=cfg)

    # host schedule
    if mode == "TaylorSeer":
        from lightx2v_tpu.caching.taylorseer import taylor_schedule
        schedule = np.asarray(taylor_schedule(steps)[0], bool)
    else:
        from lightx2v_tpu.caching.teacache import (TeaCacheConfig,
                                                   tea_decision_series)
        from lightx2v_tpu.models.wan.model import time_embeddings
        env = os.environ.get("BENCH_TEA_THRESH")
        ts = jnp.asarray(np.asarray(sched.timesteps, np.float32))
        sub = {"time_embedding": params["time_embedding"],
               "time_projection": params["time_projection"]}
        e_all, _ = jax.jit(lambda pp, tt: time_embeddings(pp, tt, arch, None))(sub, ts)
        mods = np.asarray(e_all, np.float32)
        if env:
            thresh = float(env)
        else:
            # match the reference's ~1/3-calc operating point on host
            frac = float(os.environ.get("BENCH_TEA_CALC_FRAC", 0.36))
            best, best_d = 0.26, 1e9
            for cand in np.geomspace(1e-3, 1e4, 120):
                s = tea_decision_series(mods, TeaCacheConfig(
                    thresh=float(cand), cutoff_steps=steps - 1))
                d = abs(s.sum() / steps - frac)
                if d < best_d:
                    best, best_d = float(cand), d
            thresh = best
        schedule = tea_decision_series(mods, TeaCacheConfig(
            thresh=thresh, cutoff_steps=steps - 1))
        print(json.dumps({"tea_thresh": thresh}), flush=True)
    print(json.dumps({"calc_steps": int(schedule.sum()), "of": steps}), flush=True)

    # AOT-compile both step programs BEFORE allocating the 8.4 GB cache:
    # compile itself needs no device HBM, and this sequences the phases
    # so a compile-side failure can't be confused with an alloc failure
    cache_abs = jax.eval_shape(denoise.init_cache)
    abs_of = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
    t0 = time.perf_counter()
    calc_c = jax.jit(denoise.one_step_calc, donate_argnums=(2,)).lower(
        abs_of(params), abs_of(state0), cache_abs, abs_of(ctx), abs_of(ctx_null),
        None, None).compile()
    skip_c = jax.jit(denoise.one_step_skip, donate_argnums=(2,)).lower(
        abs_of(params), abs_of(state0), cache_abs, abs_of(ctx), abs_of(ctx_null),
        None, None).compile()
    print(json.dumps({"compile_s": round(time.perf_counter() - t0, 1)}), flush=True)
    for name, c in (("calc", calc_c), ("skip", skip_c)):
        m = c.memory_analysis()
        if m is not None:
            print(json.dumps({f"{name}_peak_gib": round(
                (m.argument_size_in_bytes + m.temp_size_in_bytes
                 + m.output_size_in_bytes - m.alias_size_in_bytes) / 2**30, 2)}),
                flush=True)
    mem("compiled")

    def once():
        st, cache = state0, denoise.init_cache()
        for i in range(steps):
            fn = calc_c if schedule[i] else skip_c
            st, cache = fn(params, st, cache, ctx, ctx_null, None, None)
        out = float(jnp.sum(st["latents"].astype(jnp.float32)))
        del cache
        return out

    t0 = time.perf_counter()
    once()
    warm_s = time.perf_counter() - t0
    mem("first_run")
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    mem("timed")

    env = os.environ.get("BENCH_BASE_B1_S")
    if env:
        base = float(env)
    else:
        nb = make_denoise_fn(arch, sched, target, enable_cfg=False,
                             guide_scale=5.0, mm_type="Default",
                             self_attn_type="flash_attn3",
                             cross_attn_type="flash_attn3")
        nb_step = jax.jit(nb.one_step)

        def nb_once():
            st, cache = state0, nb.init_cache()
            for _ in range(steps):
                st, cache = nb_step(params, st, cache, ctx, ctx_null, None, None)
            return float(jnp.sum(st["latents"].astype(jnp.float32)))

        nb_once()
        t0 = time.perf_counter()
        nb_once()
        base = time.perf_counter() - t0
        print(json.dumps({"b1_nocache_baseline_s": round(base, 2)}), flush=True)

    print(json.dumps({
        "mode": f"{mode}@fp8cache-b1@fulltoken", "seconds": round(sec, 2),
        "first_run_s": round(warm_s, 2),
        "speedup_vs_nocache": round(base / sec, 3),
        "steps": steps, "shape": target, "cfg_batched": False,
    }), flush=True)


if __name__ == "__main__":
    main()
