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

    preset = os.environ.get("BENCH_ARCH_PRESET", "wan2.1_1.3b")
    arch = WanArch(**PRESETS[preset], in_dim=16, out_dim=16,
                   freq_dim=256, text_len=512, text_dim=4096)
    target = (16, int(os.environ.get("BENCH_FRAMES", 21)),
              int(os.environ.get("BENCH_H", 60)), int(os.environ.get("BENCH_W", 104)))
    steps = int(os.environ.get("BENCH_INFER_STEPS", 50))
    repeats = int(os.environ.get("BENCH_REPEATS", 1))

    # 14B bf16 exceeds one v5e; BENCH_SCHEME=int4 (+ the matching
    # BENCH_MM_TYPE) runs the capacity config with CFG B=2 resident
    scheme = os.environ.get("BENCH_SCHEME", "bf16")
    # BENCH_SELF_ATTN=sparge runs the caching rows at the flagship's
    # sparse-attention operating point (keep=0.3, 2048x1024 superblocks)
    self_attn = os.environ.get("BENCH_SELF_ATTN", "flash_attn3")
    self_attn_kwargs = None
    if self_attn == "sparge":
        self_attn_kwargs = {
            "keep_ratio": float(os.environ.get("BENCH_SPARGE_KEEP", 0.3)),
            "l1": 0.07, "block_q": 2048, "block_k": 1024,
        }
        if os.environ.get("BENCH_SPARGE_TABLE"):  # tuned per-layer l1 .npz
            _tab = np.load(os.environ["BENCH_SPARGE_TABLE"])
            self_attn_kwargs["l1_per_layer"] = _tab["l1"]
            if "passed" in _tab and not _tab["passed"][0]:
                _pa = _tab["passed"]
                self_attn_kwargs["dense_prefix"] = (
                    int(np.argmax(_pa)) if _pa.any() else len(_pa))
    params = init_random_params_on_device(arch, scheme=scheme, seed=0)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)
    ctx_null = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)

    def calibrate_tea_thresh(sched_steps, target_calc_frac=None):
        """Pick a thresh whose calc fraction matches the reference's
        operating point (~1/3 of steps compute at thresh 0.26 on the real
        checkpoint, cache_source.md). The decision input is the TIMESTEP
        embedding only, so the whole 50-step decision series simulates on
        host from 50 tiny embed fetches — synthetic weights shift the
        embedding scale the published polynomial was fit on, which is why
        a fixed 0.26 never skips here."""
        from lightx2v_tpu.caching.teacache import TeaCacheConfig
        from lightx2v_tpu.models.wan.model import time_embeddings

        frac = target_calc_frac or float(os.environ.get("BENCH_TEA_CALC_FRAC", 0.36))
        cfg0 = ConfigDict(infer_steps=steps, sample_shift=5.0)
        sched0 = WanUniPCScheduler(cfg0)
        sched0.prepare(target, seed=42)
        # one jitted call for the whole series (eager per-step ops would be
        # 50 compile RPCs through the tunnel)
        ts = jnp.asarray(np.asarray(sched0.timesteps, np.float32))
        # pass ONLY the time-embedding subtree as jit ARGUMENTS — closing
        # over the full params tree turns every weight into a program
        # constant, which the tunnel then tries to serialize (observed
        # broken-pipe at 14B)
        sub = {"time_embedding": params["time_embedding"],
               "time_projection": params["time_projection"]}
        e_all, e0_all = jax.jit(lambda pp, tt: time_embeddings(pp, tt, arch, None))(sub, ts)
        e_all = np.asarray(e_all, np.float32)    # (steps, D)
        # numpy mirror of tea_decide (caching/teacache.py:67-86) — the
        # decision is deterministic in the embed series, so the whole
        # thresh sweep runs on host with zero device round-trips
        coeffs = np.asarray(TeaCacheConfig().coefficients, np.float32)
        prev = np.zeros_like(e_all[0])
        rescaled = np.empty(steps, np.float32)
        for i in range(steps):
            rel = np.abs(e_all[i] - prev).mean() / max(np.abs(prev).mean(), 1e-8)
            rescaled[i] = np.polyval(coeffs, rel)
            prev = e_all[i]
        best, best_d, best_calc = 0.26, 1e9, steps
        for thresh in np.geomspace(1e-3, 1e4, 120):
            accum, calc = 0.0, 0
            for i in range(steps):
                accum += rescaled[i]
                should = (i < 1) or (i >= steps - 1) or (accum >= thresh)
                if should:
                    accum = 0.0
                    calc += 1
            d = abs(calc / steps - frac)
            if d < best_d:
                best, best_d, best_calc = float(thresh), d, calc
        print(json.dumps({"tea_calibration": {"thresh": best, "calc_steps": best_calc,
                                              "of": steps, "target_frac": frac}}), flush=True)
        return best

    def calibrate_ada_scale(step_fn, init_cache, state0, target_calc_frac=None):
        """Bisect the Ada metric scale so the calc fraction matches the
        reference's published operating point (2.73x I2V speedup =>
        ~0.37 of steps compute, cache_source.md:77-100). calc_count rides
        the cache carry, and metric_scale is a TRACED cache scalar, so
        every probe reuses one compiled program."""
        frac = target_calc_frac or float(os.environ.get("BENCH_ADA_CALC_FRAC", 0.37))

        def calc_frac(scale):
            st, cache = state0, init_cache()
            cache = dict(cache)
            cache["metric_scale"] = jnp.asarray(scale, jnp.float32)
            for _ in range(steps):
                st, cache = step_fn(params, st, cache, ctx, ctx_null, None, None)
            return int(cache["calc_count"]) / steps

        lo, hi = 1e-3, 1e5
        f_lo, f_hi = calc_frac(lo), calc_frac(hi)
        best, best_d = 1.0, 1e9
        for _ in range(10):
            mid = float(np.sqrt(lo * hi))
            f_mid = calc_frac(mid)
            d = abs(f_mid - frac)
            if d < best_d:
                best, best_d, best_f = mid, d, f_mid
            if f_mid < frac:
                lo = mid
            else:
                hi = mid
            if d < 0.02:
                break
        print(json.dumps({"ada_calibration": {"metric_scale": round(best, 5),
                                              "calc_frac": round(best_f, 3),
                                              "target_frac": frac,
                                              "frac_at_bounds": [f_lo, f_hi]}}), flush=True)
        return best

    modes = sys.argv[1:] or ["NoCaching", "Tea", "TaylorSeer", "Ada", "Custom"]
    baselines = {}
    if os.environ.get("BENCH_CACHE_FIDELITY"):
        # fp8-cache quality bound: same seed/steps, B=1 Taylor protocol —
        # final-latent SNR of {Taylor bf16-cache, Taylor fp8-cache} vs the
        # NoCaching trajectory, and fp8 vs bf16 directly (isolates the
        # cache-dtype cost from the caching-algorithm cost).
        lat = {}
        for label, fc, cdt in (("nocache", "NoCaching", None),
                               ("taylor_bf16cache", "TaylorSeer", "bf16"),
                               ("taylor_fp8cache", "TaylorSeer", "fp8")):
            cfg = ConfigDict(infer_steps=steps, sample_shift=5.0,
                             **({"taylor_cache_dtype": cdt} if cdt else {}))
            sched = WanUniPCScheduler(cfg)
            state0 = sched.prepare(target, seed=42)
            dn = make_denoise_fn(
                arch, sched, target, enable_cfg=False, guide_scale=5.0,
                mm_type=os.environ.get("BENCH_MM_TYPE", "Default"),
                self_attn_type="flash_attn3", cross_attn_type="flash_attn3",
                feature_caching=fc, caching_config=cfg)
            # Taylor runs step through the split-branch programs (static
            # schedule): the dual-branch cond program with a bf16 9 GB
            # cache is the same compile-helper killer as the timing rows
            if fc == "TaylorSeer" and os.environ.get("BENCH_SPLIT_BRANCH", "1") != "0":
                from lightx2v_tpu.caching.taylorseer import taylor_schedule
                fid_sched = np.asarray(taylor_schedule(steps)[0], bool)
                fns = (jax.jit(dn.one_step_skip, donate_argnums=(2,)),
                       jax.jit(dn.one_step_calc, donate_argnums=(2,)))
            else:
                fid_sched = np.ones(steps, bool)
                fns = (None, jax.jit(dn.one_step, donate_argnums=(2,)))
            st, cache = state0, dn.init_cache()
            for i in range(steps):
                st, cache = fns[int(fid_sched[i])](params, st, cache,
                                                   ctx, ctx_null, None, None)
            lat[label] = np.asarray(st["latents"], np.float32)
            # free this leg's multi-GB cache before the next leg allocates
            del st, cache, fns
            import gc
            gc.collect()

        def snr(ref, got):
            err = float(np.mean((ref - got) ** 2))
            return round(10.0 * np.log10(float(np.mean(ref**2)) / max(err, 1e-30)), 2)

        print(json.dumps({
            "mode": "cache_fidelity", "steps": steps, "shape": target,
            "snr_db_taylor_bf16_vs_nocache": snr(lat["nocache"], lat["taylor_bf16cache"]),
            "snr_db_taylor_fp8_vs_nocache": snr(lat["nocache"], lat["taylor_fp8cache"]),
            "snr_db_fp8cache_vs_bf16cache": snr(lat["taylor_bf16cache"], lat["taylor_fp8cache"]),
        }), flush=True)
        return

    if os.environ.get("BENCH_BASE_S"):  # inject a known full-shape baseline
        baselines[(target, True)] = float(os.environ["BENCH_BASE_S"])
    if os.environ.get("BENCH_BASE_B1_S"):
        # inject the B=1 (no-CFG) baseline for the full-token Taylor-family
        # protocol, so single-mode processes (one mode per process — a
        # failed mode's device buffers stay resident until process exit,
        # observed starving the NEXT mode's 8-byte PRNGKey alloc) skip
        # recomputing it
        baselines[(target, False)] = float(os.environ["BENCH_BASE_B1_S"])
    results = {}
    tea_thresh = None
    ada_scale = None
    for mode in modes:
        shape = target
        label = mode
        cfg_extra = {}
        # Taylor-family caches are 6 * L * S * D values; at bf16/CFG that
        # exceeds one v5e at full 480P tokens (reference measures on an
        # 80 GB H200). fp8 cache entries + single-sided (B=1) denoise keep
        # the FULL token count on 16 GB — measured against a B=1 baseline,
        # so the speedup stays like-for-like at the real sequence length.
        taylor_full = mode in ("TaylorSeer", "TaylorWS", "Custom") and \
            os.environ.get("BENCH_TAYLOR_FULL", "1") != "0"
        enable_cfg = not taylor_full
        # BENCH_ENABLE_CFG=0: B=1 protocol for every mode, each vs the B=1
        # NoCaching baseline. Needed at 14B 720P where the B=2 CFG step
        # program deterministically kills the tunnel's remote compile
        # helper (parts r5-1/r5-2: HTTP 500 on NoCaching AND Tea, while
        # the B=1 720P e2e compiled fine in round 4) — the speedup stays
        # like-for-like at the real sequence length.
        if os.environ.get("BENCH_ENABLE_CFG") == "0":
            enable_cfg = False
        if taylor_full:
            cfg_extra["taylor_cache_dtype"] = "fp8"
            label = f"{mode}@fp8cache-b1"
        if mode == "Tea" and os.environ.get("BENCH_TEA_CACHE_DTYPE"):
            # fp8 residual cache (clipped store) — 720P 14B capacity lever
            cfg_extra["tea_cache_dtype"] = os.environ["BENCH_TEA_CACHE_DTYPE"]
            label = f"{mode}@{cfg_extra['tea_cache_dtype']}cache"
        if mode in ("Tea", "Custom") and tea_thresh is None:
            env = os.environ.get("BENCH_TEA_THRESH")
            tea_thresh = float(env) if env else calibrate_tea_thresh(steps)
        cfg = ConfigDict(infer_steps=steps, sample_shift=5.0,
                         teacache_thresh=tea_thresh or 0.26,
                         use_ret_steps=False, **cfg_extra)
        sched = WanUniPCScheduler(cfg)
        state0 = sched.prepare(shape, seed=42)
        mm_type = os.environ.get("BENCH_MM_TYPE", "Default")
        denoise = make_denoise_fn(
            arch, sched, shape, enable_cfg=enable_cfg, guide_scale=5.0,
            mm_type=mm_type, self_attn_type=self_attn,
            self_attn_kwargs=self_attn_kwargs,
            cross_attn_type="flash_attn3", feature_caching=mode, caching_config=cfg,
        )

        # host-stepped loop: one device execution PER STEP. A whole-run
        # scan is a single ~160 s device call at 50 steps, which exceeds
        # the axon tunnel's per-execute deadline (observed ABORTED/worker
        # crash); per-step dispatch overhead is ~25 ms against ~3 s steps.
        # The cache argument is DONATED: it is threaded step to step and
        # never reused, and for Taylor-family full-token runs it is ~9 GB
        # of fp8 entries — without donation the step program carries input
        # AND output cache buffers (~18 GB), which is what pushed the
        # full-token compile over the remote helper's limit.
        step_fn = jax.jit(denoise.one_step, donate_argnums=(2,))

        # Split-branch host scheduling (default for the full-token
        # Taylor-family rows): the dual-branch lax.cond program at full
        # 480P tokens + 9 GB fp8 cache kills the tunnel's remote compile
        # helper (HTTP 500, BENCHLOG parts 2/5/7). Taylor's calc pattern
        # is STATIC and Custom's Tea decision depends only on the
        # timestep-embedding series (replayed exactly on host,
        # teacache.tea_decision_series), so the driver picks the branch
        # per step across two half-sized programs
        # (pipeline.one_step_calc/_skip). Opt out: BENCH_SPLIT_BRANCH=0.
        split_sched = None
        # Tea rides split-branch too when the decision is shared (B=1, or
        # BENCH_ENABLE_CFG=0): the dual-branch lax.cond program
        # RESOURCE_EXHAUSTs at 14B 720P token counts where the plain
        # forward fits (part r5-3), and tea_decision_series replays the
        # shared decision exactly
        tea_split = (mode == "Tea" and not enable_cfg
                     and os.environ.get("BENCH_SPLIT_BRANCH", "1") != "0")
        # BENCH_ADA_FORCE_FRAC: run Ada's mechanism (decisive-block capture
        # + residual store on calc, residual reuse on skip) on a host-forced
        # evenly-spaced schedule at the given calc fraction — the
        # matched-calc-count comparison VERDICT r4 weak-#2 asked for (the
        # codebook can't reach the reference's 0.37 point on synthetic
        # weights; its achievable frac bisects to [0.12, 0.18])
        ada_force = (os.environ.get("BENCH_ADA_FORCE_FRAC")
                     if mode == "Ada" else None)
        if ada_force:
            frac = float(ada_force)
            marks = np.floor(np.arange(steps) * frac)
            split_sched = np.concatenate([[True], np.diff(marks) > 0]).astype(bool)
            label = f"Ada@forced{frac:g}"
        if (taylor_full or tea_split) and os.environ.get("BENCH_SPLIT_BRANCH", "1") != "0":
            if mode in ("TaylorSeer", "TaylorWS"):
                from lightx2v_tpu.caching.taylorseer import taylor_schedule
                split_sched = np.asarray(taylor_schedule(steps)[0], bool)
            else:  # Custom / Tea — host-exact Tea-decision replay
                from lightx2v_tpu.caching.teacache import (TeaCacheConfig,
                                                           tea_decision_series)
                from lightx2v_tpu.models.wan.model import time_embeddings
                tcfg = TeaCacheConfig.from_config(cfg)
                ts = jnp.asarray(np.asarray(sched.timesteps, np.float32))
                sub = {"time_embedding": params["time_embedding"],
                       "time_projection": params["time_projection"]}
                e_all, e0_all = jax.jit(
                    lambda pp, tt: time_embeddings(pp, tt, arch, None))(sub, ts)
                mods = np.asarray(e0_all if tcfg.use_ret_steps else e_all, np.float32)
                split_sched = tea_decision_series(mods, tcfg)
            label = f"{label}@splitbranch"
        if split_sched is not None:
            print(json.dumps({"split_branch_calc_steps": int(split_sched.sum()),
                              "of": steps}), flush=True)
            calc_fn = jax.jit(denoise.one_step_calc, donate_argnums=(2,))
            skip_fn = jax.jit(denoise.one_step_skip, donate_argnums=(2,))

        def once(cache_override=None):
            st, cache = state0, denoise.init_cache()
            if cache_override:
                # materialize fresh device buffers per call: with
                # donate_argnums the first timed call donates (deletes)
                # the override arrays, and a shared buffer would make
                # repeat #2 die with 'Array has been deleted'
                cache = dict(cache, **{k: jnp.asarray(v) if not isinstance(v, jnp.ndarray)
                                       else jnp.array(v) for k, v in cache_override.items()})
            for idx in range(steps):
                fn = step_fn if split_sched is None else \
                    (calc_fn if split_sched[idx] else skip_fn)
                st, cache = fn(params, st, cache, ctx, ctx_null, None, None)
            out = float(jnp.sum(st["latents"].astype(jnp.float32)))
            return out, cache

        t0 = time.perf_counter()
        try:
            _, cache_f = once()  # compile + first run
        except Exception as e:
            print(json.dumps({"mode": label, "error": str(e)[:200]}), flush=True)
            # drop every reference to this mode's device buffers before the
            # next mode allocates (the traceback pins once()'s frame with
            # the ~9 GB cache; observed: the NEXT mode's eager latent init
            # OOMing after a caught Taylor OOM)
            import gc
            del denoise, state0
            gc.collect()
            continue
        compile_s = time.perf_counter() - t0

        try:
            cache_override = None
            if mode == "Ada" and not ada_force:
                env = os.environ.get("BENCH_ADA_SCALE")
                ada_scale = float(env) if env else calibrate_ada_scale(
                    step_fn, denoise.init_cache, state0)
                cache_override = {"metric_scale": jnp.asarray(ada_scale, jnp.float32)}
                label = f"Ada@scale{ada_scale:.3g}"
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                _, cache_f = once(cache_override)
                times.append(time.perf_counter() - t0)
        except Exception as e:  # isolate: one mode's OOM must not kill the rest
            print(json.dumps({"mode": label, "error": str(e)[:200]}), flush=True)
            import gc
            del denoise, state0, cache_f
            gc.collect()
            continue
        sec = float(np.median(times))
        extra = {}
        if mode == "Ada":
            extra["calc_steps"] = int(cache_f["calc_count"])
        bkey = (shape, enable_cfg)
        if mode == "NoCaching":
            baselines[bkey] = sec
            baselines[(shape, True)] = sec  # full CFG baseline key
        if bkey not in baselines:
            # different protocol (B=1 Taylor rows): time its own NoCaching
            # baseline so the speedup compares like against like
            nb = make_denoise_fn(arch, sched, shape, enable_cfg=enable_cfg,
                                 guide_scale=5.0,
                                 mm_type=mm_type, self_attn_type=self_attn,
                                 self_attn_kwargs=self_attn_kwargs,
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
            baselines[bkey] = time.perf_counter() - t0
            print(json.dumps({"b1_nocache_baseline_s": round(baselines[bkey], 2),
                              "shape": shape}), flush=True)
        base = baselines.get(bkey)
        results[label] = sec
        print(json.dumps({
            "mode": label, "seconds": round(sec, 2),
            "compile_s": round(compile_s, 1),
            "speedup_vs_nocache": round(base / sec, 3) if base else None,
            "steps": steps, "shape": shape, "cfg_batched": enable_cfg, **extra,
        }), flush=True)


if __name__ == "__main__":
    main()
