"""AOT memory probe for the full-token Taylor step programs.

Lowers one_step_calc / one_step_skip (and the traced-cond one_step) with
abstract ShapeDtypeStruct args — NO device buffers are allocated — then
compiles and prints XLA's memory analysis: argument/output/temp bytes and
whether the donated cache actually aliased input->output. This answers,
without burning an execution attempt, why the full-token TaylorSeer row
(fp8 cache, B=1, S=32760) hits RESOURCE_EXHAUSTED at runtime on a
15.75 GB v5e (BENCHLOG_r04 parts 12-13).

Usage: python scripts/bench/probe_taylor_memory.py [calc skip cond]
Env: BENCH_H/BENCH_W/BENCH_FRAMES to shrink tokens, PROBE_CACHE_DTYPE.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.config import PRESETS, WanArch
    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    preset = os.environ.get("BENCH_ARCH_PRESET", "wan2.1_1.3b")
    arch = WanArch(**PRESETS[preset], in_dim=16, out_dim=16,
                   freq_dim=256, text_len=512, text_dim=4096)
    target = (16, int(os.environ.get("BENCH_FRAMES", 21)),
              int(os.environ.get("BENCH_H", 60)), int(os.environ.get("BENCH_W", 104)))
    steps = int(os.environ.get("BENCH_INFER_STEPS", 50))
    cfg = ConfigDict(infer_steps=steps, sample_shift=5.0,
                     taylor_cache_dtype=os.environ.get("PROBE_CACHE_DTYPE", "fp8"))
    sched = WanUniPCScheduler(cfg)
    state0 = sched.prepare(target, seed=42)
    denoise = make_denoise_fn(arch, sched, target, enable_cfg=False,
                              guide_scale=5.0, mm_type="Default",
                              self_attn_type="flash_attn3",
                              cross_attn_type="flash_attn3",
                              feature_caching="TaylorSeer", caching_config=cfg)

    # abstract args: mirror bench_caching's real dtypes/shapes (eval_shape
    # traces the on-device synthesizer without allocating anything)
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device
    p_abs = jax.eval_shape(
        lambda: init_random_params_on_device(arch, scheme="bf16", seed=0))
    st_abs = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state0)
    cache_abs = jax.eval_shape(denoise.init_cache)
    ctx_abs = jax.ShapeDtypeStruct((1, arch.text_len, arch.text_dim), jnp.bfloat16)

    progs = sys.argv[1:] or ["calc", "skip", "cond"]
    fns = {"calc": denoise.one_step_calc, "skip": denoise.one_step_skip,
           "cond": denoise.one_step}
    gib = 1024.0 ** 3
    for name in progs:
        lowered = jax.jit(fns[name], donate_argnums=(2,)).lower(
            p_abs, st_abs, cache_abs, ctx_abs, ctx_abs, None, None)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        row = {"program": name}
        if m is not None:
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(m, k, None)
                if v is not None:
                    row[k.replace("_in_bytes", "_gib")] = round(v / gib, 3)
            live = (row.get("argument_size_gib", 0) + row.get("temp_size_gib", 0)
                    + row.get("output_size_gib", 0) - row.get("alias_size_gib", 0))
            row["peak_live_est_gib"] = round(live, 3)
        try:
            aliases = compiled.runtime_executable().hlo_modules()[0] and None
        except Exception:
            pass
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
