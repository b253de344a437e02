"""CausVid autoregressive TPU bench — the first measured row for the
KV-cache AR family (previously dryrun-only).

Mirrors the runner loop exactly (runners/wan_causvid_runner.py run_dit —
itself the reference wan_causvid_runner.py:75-130 protocol: per AR frame
block, distilled multi-step denoise attending q(new block) x
kv_cache[:kv_end], DUS cache writes, rope offset by start frame) but
synthesizes the weights ON DEVICE (init_random_params_on_device — the
runner's synthetic path host-inits, and 2.8 GB through the axon tunnel
at single-digit MB/s is minutes).

Protocol: 480P (60x104 latents), 21-frame window, num_frame_per_block=7
(3 AR blocks), the runner's default 9-entry causvid denoising_step_list
-> 27 block-forwards. No published H200 row exists for this config ->
capability row (vs_baseline 0).

Env: BENCH_PRESET (1.3b default | 14b), BENCH_MM (bf16 default | int8 |
int4a8), BENCH_STEPS timed repeats (default 1 full AR generation after a
warmup generation), CAUSVID_FPB / CAUSVID_FRAMES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from lightx2v_tpu.models.wan.config import PRESETS, WanArch
    from lightx2v_tpu.models.wan.causvid import (causvid_forward,
                                                 init_kv_cache,
                                                 precompute_cross_kv)
    from lightx2v_tpu.ops.rope import build_wan_rope_grid
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device
    from lightx2v_tpu.schedulers.step_distill import WanStepDistillScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    preset = os.environ.get("BENCH_PRESET", "1.3b")
    kw = PRESETS["wan2.1_14b"] if preset == "14b" else PRESETS["wan2.1_1.3b"]
    arch = WanArch(**kw, in_dim=16, out_dim=16, freq_dim=256, text_len=512,
                   text_dim=4096)
    mm_env = os.environ.get("BENCH_MM", "bf16")
    scheme, mm_type = {
        "bf16": ("bf16", "Default"),
        "int8": ("int8", "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu"),
        "int4a8": ("int4", "W-int4-group-sym-A-int8-token-dynamic-Tpu"),
    }[mm_env]

    lat_h = int(os.environ.get("CAUSVID_LAT_H", 60))   # 480P / stride 8
    lat_w = int(os.environ.get("CAUSVID_LAT_W", 104))
    pt, ph, pw = arch.patch_size
    frame_seq = (lat_h // ph) * (lat_w // pw)
    num_frames = int(os.environ.get("CAUSVID_FRAMES", 21))
    fpb = int(os.environ.get("CAUSVID_FPB", 7))
    num_blocks = num_frames // fpb
    target_blk = (16, fpb, lat_h, lat_w)

    params = init_random_params_on_device(arch, scheme=scheme, seed=0)
    jax.block_until_ready(params)

    sched = WanStepDistillScheduler(ConfigDict(
        denoising_step_list=[999, 934, 862, 756, 603, 410, 250, 140, 74],
        sample_shift=8.0, infer_steps=9))
    state0 = sched.prepare(target_blk, 42)
    n_steps = sched.num_steps()

    rng = jax.random.PRNGKey(0)
    ctx = jax.random.normal(rng, (1, arch.text_len, arch.dim), jnp.bfloat16) * 0.05
    cross_kv = precompute_cross_kv(params, ctx, arch)

    kv_size = num_frames * frame_seq
    kv_cache = init_kv_cache(arch, kv_size)

    gf = fpb // pt
    rope_tabs = {
        sfr: tuple(map(jnp.asarray, build_wan_rope_grid(
            arch.head_dim, gf, lat_h // ph, lat_w // pw, start_frame=sfr)))
        for sfr in range(0, num_frames, fpb)
    }

    fwd = partial(causvid_forward, arch=arch, mm_type=mm_type,
                  attn_type="flash_attn3")

    # donate state+cache: lets XLA alias the (L, kv, D) k/v buffers across
    # steps instead of holding input+restacked output caches live together
    # (the bf16 21-frame run OOMed exactly on that 2x6 GB overlap)
    @partial(jax.jit, donate_argnums=(2,))
    def block_denoise(params, state, kv_cache, cross_kv, cos, sin,
                      kv_start, kv_len):
        def body(carry, _):
            st, cache = carry
            lat, t = sched.step_pre(st)
            pred, cache = fwd(params, lat[None], t[None].astype(jnp.float32),
                              cache, cross_kv, cos, sin, kv_start, kv_len)
            st = sched.step_post(st, pred[0])
            return (st, cache), None

        (state, kv_cache), _ = jax.lax.scan(body, (state, kv_cache), None,
                                            length=n_steps)
        return state, kv_cache

    def generate(kv_cache):
        kv_start, kv_end = 0, fpb * frame_seq
        outs = []
        r = jax.random.PRNGKey(42)
        for b in range(num_blocks):
            r, sub = jax.random.split(r)
            st = dict(state0)
            st["latents"] = jax.random.normal(sub, target_blk, jnp.float32)
            cos, sin = rope_tabs[kv_start // frame_seq]
            st, kv_cache = block_denoise(params, st, kv_cache, cross_kv,
                                         cos, sin, jnp.asarray(kv_start),
                                         jnp.asarray(kv_end))
            outs = outs[-1:]  # keep only the previous block (sum target)
            outs.append(st["latents"])
            kv_start, kv_end = kv_end, kv_end + fpb * frame_seq
        # scalar-fetch sync (block_until_ready does not block on axon)
        return float(jnp.sum(outs[-1].astype(jnp.float32)))

    t0 = time.perf_counter()
    generate(kv_cache)
    compile_s = time.perf_counter() - t0

    reps = int(os.environ.get("BENCH_STEPS", 1))
    times = []
    for _ in range(reps):
        kv_cache = init_kv_cache(arch, kv_size)
        t0 = time.perf_counter()
        generate(kv_cache)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fwd_ms = best / (num_blocks * n_steps) * 1e3
    print(json.dumps({
        "metric": f"wan{preset}_causvid_480p_{num_frames}f_dit_s_on_v5e"
                  f"[{mm_env}] (AR {num_blocks} blocks x {n_steps} distilled "
                  f"steps, KV window {kv_size} tokens; capability row, no "
                  f"published H200 analog)",
        "value": round(best, 2), "unit": "s", "vs_baseline": 0.0,
        "compile_s": round(compile_s, 1),
        "per_block_forward_ms": round(fwd_ms, 1),
    }))


if __name__ == "__main__":
    main()
