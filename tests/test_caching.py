"""Feature caching tests.

TeaCache semantics checks: warm-up always computes, small embedding
deltas accumulate then skip, skip applies the cached residual exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.caching.teacache import TeaCacheConfig, init_tea_state, tea_decide, tea_transform
from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
from lightx2v_tpu.utils.config import ConfigDict

ARCH = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
               freq_dim=32, text_len=8, text_dim=16)
TARGET = (4, 2, 4, 8)


def test_tea_decide_warmup_and_accumulate():
    cfg = TeaCacheConfig(thresh=0.5, coefficients=(1.0, 0.0), ret_steps=1, cutoff_steps=100)
    # poly(x) = x: accumulator == sum of rel-L1 distances
    st = init_tea_state((1, 4, 8), (1, 8))
    e = jnp.ones((1, 8), jnp.float32)
    # step 0: warmup -> always calc, accum reset
    should, st = tea_decide(st, e, None, jnp.asarray(0), cfg)
    assert bool(should)
    assert float(st["accum"][0]) == 0.0
    # step 1: tiny delta -> below thresh -> skip
    should, st = tea_decide(st, e * 1.01, None, jnp.asarray(1), cfg)
    assert not bool(should)
    assert float(st["accum"][0]) > 0
    # repeated deltas accumulate past thresh -> calc + reset
    for i in range(2, 80):
        should, st = tea_decide(st, e * (1 + 0.01 * i), None, jnp.asarray(i), cfg)
        if bool(should):
            break
    assert bool(should)
    assert float(st["accum"][0]) == 0.0


def test_tea_transform_skip_applies_residual():
    st = init_tea_state((1, 4, 8), (1, 8))
    st["prev_residual"] = jnp.full((1, 4, 8), 0.5, jnp.bfloat16)
    x = jnp.ones((1, 4, 8), jnp.bfloat16)
    fn = lambda xx: xx * 3.0
    out, st2 = tea_transform(st, jnp.asarray(False), x, fn)
    np.testing.assert_allclose(np.asarray(out, np.float32), 1.5)
    # compute branch stores new residual
    out, st3 = tea_transform(st, jnp.asarray(True), x, fn)
    np.testing.assert_allclose(np.asarray(out, np.float32), 3.0)
    np.testing.assert_allclose(np.asarray(st3["prev_residual"], np.float32), 2.0)


def test_tea_denoise_loop_runs():
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 0.26,
                      "use_ret_steps": False})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=5.0,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Tea", caching_config=cfg)
    out = denoise(params, state, ctx, ctx * 0.5)
    assert np.isfinite(np.asarray(out["latents"])).all()
    assert out["step_index"] == 6


def test_taylor_schedule():
    from lightx2v_tpu.caching.taylorseer import taylor_schedule

    is_calc, diff = taylor_schedule(8, pattern=4)
    assert list(is_calc) == [True, False, False, False] * 2
    assert list(diff) == [1.0, 1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0]


def test_taylor_denoise_loop_runs():
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="TaylorSeer", caching_config=cfg)
    out = denoise(params, state, ctx, ctx)
    assert np.isfinite(np.asarray(out["latents"])).all()


def test_ada_denoise_loop_runs():
    cfg = ConfigDict({"infer_steps": 8, "sample_shift": 5.0})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Ada", caching_config=cfg)
    out = denoise(params, state, ctx, ctx)
    assert np.isfinite(np.asarray(out["latents"])).all()


def test_taylor_caching_approximates_full(  ):
    """With smooth dynamics (small weights) the Taylor-cached trajectory
    should stay close to the exact one."""
    cfg = ConfigDict({"infer_steps": 8, "sample_shift": 5.0})
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.02), ARCH)
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 16)) * 0.1, jnp.float32)
    outs = {}
    for caching in ("NoCaching", "TaylorSeer"):
        sched = WanUniPCScheduler(cfg)
        state = sched.prepare(TARGET, seed=3)
        d = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                            self_attn_type="xla", cross_attn_type="xla",
                            feature_caching=caching, caching_config=cfg)
        outs[caching] = np.asarray(d(params, state, ctx, ctx)["latents"], np.float32)
    c = np.corrcoef(outs["NoCaching"].ravel(), outs["TaylorSeer"].ravel())[0, 1]
    assert c > 0.98, f"caching diverged, corr {c}"


def test_custom_caching_denoise_loop_runs():
    """Custom = Tea rel-L1 decision + Taylor per-module extrapolation
    (reference WanTransformerInferCustomCaching)."""
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 0.26,
                      "use_ret_steps": False})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=5.0,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Custom", caching_config=cfg)
    out = denoise(params, state, ctx, ctx * 0.5)
    assert np.isfinite(np.asarray(out["latents"])).all()
    assert out["step_index"] == 6

    # with a huge threshold everything after warmup is skipped -> still finite
    cfg2 = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 1e9,
                       "use_ret_steps": False})
    sched2 = WanUniPCScheduler(cfg2)
    state2 = sched2.prepare(TARGET, seed=0)
    denoise2 = make_denoise_fn(ARCH, sched2, TARGET, enable_cfg=True, guide_scale=5.0,
                               self_attn_type="xla", cross_attn_type="xla",
                               feature_caching="Custom", caching_config=cfg2)
    out2 = denoise2(params, state2, ctx, ctx * 0.5)
    assert np.isfinite(np.asarray(out2["latents"])).all()
    # skipping must actually change the trajectory vs always-computing
    assert not np.allclose(np.asarray(out["latents"]), np.asarray(out2["latents"]))


def test_teacache_per_side_decisions_diverge():
    """Per-side decision vector: forcing one side's accumulator over the
    threshold must compute only that side (reference per-side skipping,
    feature_caching/transformer_infer.py:14-19)."""
    from lightx2v_tpu.caching.teacache import (TeaCacheConfig, init_tea_state,
                                               tea_decide_per_side)

    cfg = TeaCacheConfig(thresh=0.5, ret_steps=1, cutoff_steps=100)
    st = init_tea_state((2, 8, 16), (2, 16))
    st["prev_mod"] = jnp.ones((2, 16), jnp.float32)
    # cond side far from prev (big rel-L1), uncond identical (zero rel-L1)
    embed = jnp.stack([jnp.full((16,), 50.0), jnp.ones((16,))])
    vec, st2 = tea_decide_per_side(st, embed, None, jnp.asarray(5), cfg)
    v = np.asarray(vec)
    assert v[0] and not v[1]
    # the skipped side keeps accumulating, the computed side resets
    assert float(st2["accum"][0]) == 0.0


def test_teacache_per_side_transform_correctness():
    """lax.switch branches: compute-one-side output equals running the
    transformer on that side + cached residual on the other."""
    from lightx2v_tpu.caching.teacache import tea_transform_per_side

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    resid = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    st = {"prev_residual": resid}
    f_full = lambda xx: xx * 2.0
    f_single = lambda xx, side: xx * 2.0

    # both
    out, st2 = tea_transform_per_side(dict(st), jnp.asarray([True, True]), x, f_full, f_single)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2["prev_residual"]), np.asarray(x), rtol=1e-6)

    # only cond
    out, st2 = tea_transform_per_side(dict(st), jnp.asarray([True, False]), x, f_full, f_single)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]) * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1] + resid[1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2["prev_residual"][0]), np.asarray(x[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2["prev_residual"][1]), np.asarray(resid[1]), rtol=1e-6)

    # neither
    out, _ = tea_transform_per_side(dict(st), jnp.asarray([False, False]), x, f_full, f_single)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + resid), rtol=1e-6)


def test_teacache_per_side_pipeline_runs():
    """Full denoise with per-side TeaCache under batched CFG stays finite
    (exercises all four lax.switch branches over the step sequence)."""
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 0.05,
                      "use_ret_steps": False})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=5.0,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Tea", caching_config=cfg)
    out = denoise(params, state, ctx, ctx * 0.5)
    a = np.asarray(out["latents"], np.float32)
    assert np.isfinite(a).all()


def test_split_branch_matches_traced_cond():
    """Host-scheduled trace-time branching (one_step_calc/_skip) must
    reproduce the traced lax.cond trajectory exactly — for TaylorSeer
    (static schedule) and Custom (Tea decision replayed on host via
    tea_decision_series from the timestep-embedding series alone)."""
    from lightx2v_tpu.caching.taylorseer import taylor_schedule
    from lightx2v_tpu.caching.teacache import tea_decision_series
    from lightx2v_tpu.models.wan.model import time_embeddings

    steps = 8
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    ctx = jnp.asarray(np.random.default_rng(4).standard_normal((1, 8, 16)), jnp.float32)

    # pick a Tea thresh that produces a MIXED schedule for these random
    # weights (the published 0.26 was fit to a trained checkpoint's
    # embedding scale): replay the host decision series over a sweep
    cfg0 = ConfigDict({"infer_steps": steps, "sample_shift": 5.0,
                       "teacache_thresh": 0.26, "use_ret_steps": False})
    sched0 = WanUniPCScheduler(cfg0)
    sched0.prepare(TARGET, seed=1)
    ts = jnp.asarray(np.asarray(sched0.timesteps, np.float32))
    sub = {"time_embedding": params["time_embedding"],
           "time_projection": params["time_projection"]}
    e_all, e0_all = jax.jit(
        lambda pp, tt: time_embeddings(pp, tt, ARCH, None))(sub, ts)
    mods = np.asarray(e_all, np.float32)
    thresh = None
    for cand in np.geomspace(1e-2, 1e6, 60):
        s = tea_decision_series(mods, TeaCacheConfig(thresh=float(cand),
                                                     cutoff_steps=steps - 1))
        if s.any() and not s.all() and s.sum() > 1:
            thresh = float(cand)
            break
    assert thresh is not None, "no mixed-schedule thresh found"

    for mode in ("TaylorSeer", "Custom", "Tea"):
        cfg = ConfigDict({"infer_steps": steps, "sample_shift": 5.0,
                          "teacache_thresh": thresh, "use_ret_steps": False})
        sched = WanUniPCScheduler(cfg)
        state0 = sched.prepare(TARGET, seed=1)
        denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                                  self_attn_type="xla", cross_attn_type="xla",
                                  feature_caching=mode, caching_config=cfg)

        if mode == "TaylorSeer":
            schedule = np.asarray(taylor_schedule(steps)[0], bool)
        else:
            tcfg = TeaCacheConfig.from_config(cfg)
            schedule = tea_decision_series(mods, tcfg)
            assert schedule.any() and not schedule.all(), \
                f"degenerate schedule {schedule} — tune thresh for the test"

        step_cond = jax.jit(denoise.one_step)
        step_calc = jax.jit(denoise.one_step_calc)
        step_skip = jax.jit(denoise.one_step_skip)

        st_a, cache_a = state0, denoise.init_cache()
        st_b, cache_b = state0, denoise.init_cache()
        for i in range(steps):
            st_a, cache_a = step_cond(params, st_a, cache_a, ctx, ctx, None, None)
            fn = step_calc if schedule[i] else step_skip
            st_b, cache_b = fn(params, st_b, cache_b, ctx, ctx, None, None)
        a = np.asarray(st_a["latents"], np.float32)
        b = np.asarray(st_b["latents"], np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
        # the two trajectories picked identical branches: exactness bar
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < 2e-2, f"{mode}: split-branch diverged, rel {err}"


def test_tea_fp8_cache_residual():
    """tea_cache_dtype=fp8 stores the residual clipped to e4m3 range
    (never inf/nan) and the skip step reconstructs from it; the denoise
    loop stays finite end-to-end (the 14B 720P capacity lever)."""
    # direct clip check: a residual beyond 448 saturates to 448, not inf
    st = init_tea_state((1, 4, 8), (1, 8), dtype=jnp.float8_e4m3fn)
    x = jnp.ones((1, 4, 8), jnp.bfloat16)
    out, st2 = tea_transform(st, jnp.asarray(True), x, lambda xx: xx + 1000.0)
    stored = np.asarray(st2["prev_residual"], np.float32)
    assert np.isfinite(stored).all()
    np.testing.assert_allclose(stored, 448.0)

    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 0.26,
                      "use_ret_steps": False, "tea_cache_dtype": "fp8"})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=0)
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 16)), jnp.float32)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Tea", caching_config=cfg)
    assert denoise.init_cache()["prev_residual"].dtype == jnp.float8_e4m3fn
    out = denoise(params, state, ctx, ctx)
    assert np.isfinite(np.asarray(out["latents"])).all()


def test_custom_tea_residual_not_allocated():
    """Custom never reads the Tea residual (Taylor reconstructs skipped
    steps), so its tea sub-cache must not carry a (B, S, D) buffer."""
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0, "teacache_thresh": 0.26,
                      "use_ret_steps": False})
    sched = WanUniPCScheduler(cfg)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                              self_attn_type="xla", cross_attn_type="xla",
                              feature_caching="Custom", caching_config=cfg)
    cache = denoise.init_cache()
    assert cache["tea"]["prev_residual"].shape[1] == 1


def test_ada_split_branch_forced_schedule():
    """Ada honors trace-time _branch selection (one_step_calc/_skip), the
    mechanism behind matched-calc-count rows vs the reference's published
    Ada operating point (BENCH_ADA_FORCE_FRAC): calc_count follows the
    host schedule, and an all-calc forced run tracks the NoCaching
    trajectory."""
    cfg = ConfigDict({"infer_steps": 6, "sample_shift": 5.0})
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.02), ARCH)
    ctx = jnp.asarray(np.random.default_rng(4).standard_normal((1, 8, 16)) * 0.1,
                      jnp.float32)

    def run(schedule, caching):
        sched = WanUniPCScheduler(cfg)
        state = sched.prepare(TARGET, seed=5)
        d = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                            self_attn_type="xla", cross_attn_type="xla",
                            feature_caching=caching, caching_config=cfg)
        st, cache = state, d.init_cache()
        for calc in schedule:
            fn = d.one_step_calc if calc else d.one_step_skip
            st, cache = fn(params, st, cache, ctx, ctx, None, None)
        return np.asarray(st["latents"], np.float32), cache

    sched_forced = [True, False, True, False, True, False]
    lat, cache = run(sched_forced, "Ada")
    assert np.isfinite(lat).all()
    assert int(cache["calc_count"]) == 3

    lat_all, cache_all = run([True] * 6, "Ada")
    assert int(cache_all["calc_count"]) == 6
    lat_ref, _ = run([True] * 6, "NoCaching")
    c = np.corrcoef(lat_all.ravel(), lat_ref.ravel())[0, 1]
    assert c > 0.98, f"all-calc Ada diverged from NoCaching, corr {c}"


def test_taylor_ws_denoise_loop_runs_and_approximates():
    """Whole-stack Taylor (TaylorWS) — the capacity-fit variant for
    14B/720P where per-module caches are 6*L*S*D (~20.8 GB fp8): the
    compiled loop runs, and with smooth dynamics tracks the exact
    trajectory like per-module TaylorSeer does."""
    cfg = ConfigDict({"infer_steps": 8, "sample_shift": 5.0})
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.02), ARCH)
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 16)) * 0.1, jnp.float32)
    outs = {}
    for caching in ("NoCaching", "TaylorWS"):
        sched = WanUniPCScheduler(cfg)
        state = sched.prepare(TARGET, seed=3)
        d = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                            self_attn_type="xla", cross_attn_type="xla",
                            feature_caching=caching, caching_config=cfg)
        outs[caching] = np.asarray(d(params, state, ctx, ctx)["latents"], np.float32)
    c = np.corrcoef(outs["NoCaching"].ravel(), outs["TaylorWS"].ravel())[0, 1]
    assert c > 0.98, f"whole-stack caching diverged, corr {c}"


def test_taylor_ws_first_skip_replays_f0_exactly():
    """fp32 cache + fp32 add: the first skip after the first calc must
    apply EXACTLY the calc step's whole-stack residual (matches the
    streamed path's replay-exactness property, test_streaming)."""
    from lightx2v_tpu.caching.taylorseer import (init_taylor_ws_cache,
                                                 taylor_ws_calc,
                                                 taylor_ws_skip)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    cache = init_taylor_ws_cache(1, 16, 8, dtype=jnp.float32)
    tf = lambda xx: xx * 1.5 + 0.25  # stand-in transformer
    x_out, cache = taylor_ws_calc(tf, x, cache, jnp.asarray(0))
    # first calc: derivative must be zero (unprimed)
    np.testing.assert_array_equal(np.asarray(cache["f1"]), 0.0)
    x2 = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    rec = taylor_ws_skip(x2, cache, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x2 + (x_out - x)),
                               rtol=0, atol=1e-6)
