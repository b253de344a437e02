"""Benchmark driver. Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Default (no BENCH_* env): the flagship row — Wan2.1-14B 4-step distill
e2e at 480P (w4a8 + sparge + fused rope + decode-after-release untiled
VAE) vs the reference's 14 s H200 distill e2e. The earlier rounds'
default (1.3B bf16 DiT forward) is BENCH_PRESET=1.3b BENCH_MODE=forward.

Baseline: the reference's Wan2.1-T2V-1.3B 480P run takes 58 s for 50 UniPC
steps with CFG (100 DiT forwards) on an H200 => 580 ms per DiT forward
(docs cache_source.md:15-38; see BASELINE.md).

vs_baseline reports two honesty levels via the metric name:
  raw      = baseline_ms / ours_ms               (H200 vs one v5e, unequal iron)
  reported = (baseline_ms * peak_ratio) / ours_ms  (chip-normalized: H200 peak
             ~990 bf16 TFLOP/s vs v5e ~197 => ratio 5.03). >1 means our
             per-forward time beats the reference after accounting for the
             5x peak-FLOPs gap of the benchmark chip. The raw ratio is
             included in the metric string.

Env knobs:
  BENCH_PRESET  = 1.3b (default) | 14b | tiny
  BENCH_MODE    = forward (default) | e2e   (e2e = T5 + 4-step distill
                  denoise + VAE decode wall-clock, vs the reference's
                  14 s H200 LightX2V_3-Distill row, BASELINE.md:16)
  BENCH_MM      = Default | int8 | fp8 | int4 | fp8_block128
  BENCH_ATTN    = flash_attn3 | sage_attn2 | sparge | radial_attn | ...
  BENCH_FRAMES / BENCH_H / BENCH_W (latent dims), BENCH_STEPS (timed iters)

Weights are synthesized ON DEVICE (models/wan/weights.py
init_random_params_on_device): the benchmark chip is reached through a
tunnel that moves host->device at single-digit MB/s, so 2.6-28 GB weight
uploads would dominate wall-clock and 14B could never run at all.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

H200_1P3B_480P_MS_PER_FORWARD = 580.0
# LightX2V_3-Distill (fp8 + tiled VAE, 4 steps, no CFG): 14 s e2e at 14B 480P
# on H200 (BASELINE.md:16)
H200_14B_480P_DISTILL_E2E_S = 14.0
# per-forward 14B 480P with CFG: LightX2V_3 (fp8) 191 s / (40 steps * 2) = 2.39 s
H200_14B_480P_MS_PER_FORWARD = 191_000.0 / 80.0
# 720P rows (BASELINE.md:18-22): LightX2V_3 671 s / 80 forwards; Distill 44 s e2e
H200_14B_720P_MS_PER_FORWARD = 671_000.0 / 80.0
H200_14B_720P_DISTILL_E2E_S = 44.0
PEAK_RATIO = 990.0 / 197.0  # H200 bf16 peak / v5e bf16 peak

MM_ALIAS = {
    "int8": "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu",
    "fp8": "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Tpu",
    "int4": "W-int4-group-sym-A-bf16-Tpu",
    "int4a8": "W-int4-group-sym-A-int8-token-dynamic-Tpu",
    "fp8_block128": "W-fp8-block128-A-fp8-block128-dynamic-Tpu",
}


def emit(metric, value, unit, vs):
    print(json.dumps({"metric": metric, "value": round(value, 2), "unit": unit,
                      "vs_baseline": round(vs, 3)}))


def main():
    import jax
    import jax.numpy as jnp

    # every driver-recorded BENCH run doubles as the kernel-dispatch proof:
    # on TPU a Pallas kernel failing to build is a hard error, not a silent
    # XLA fallback (weak finding VERDICT r2 #9 — the pytest dispatch
    # assertions skip off-TPU, so this is the standing per-round evidence)
    if jax.default_backend() == "tpu":
        os.environ.setdefault("LIGHTX2V_STRICT_KERNELS", "1")

    from lightx2v_tpu.models.wan.config import PRESETS, WanArch
    from lightx2v_tpu.models.wan.model import wan_forward
    from lightx2v_tpu.models.wan.pipeline import rope_for_shape
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device

    if os.environ.get("BENCH_MODEL") == "hunyuan":
        run_hunyuan()
        return
    if os.environ.get("BENCH_MODEL") == "cogvideox":
        run_cogvideox()
        return

    # Driver default (no BENCH_*-prefixed env AT ALL): the FLAGSHIP row —
    # 14B 4-step distill e2e, w4a8 + sparge + fused rope — vs the
    # reference's headline 14 s H200 distill e2e (BASELINE.md:16). Any
    # BENCH_* knob (incl. BENCH_ATTN/BENCH_MM/BENCH_H alone) keeps the
    # historical per-knob defaults (1.3B bf16 forward). The round-1/2
    # default is BENCH_PRESET=1.3b BENCH_MODE=forward.
    if not any(k.startswith("BENCH_") for k in os.environ):
        os.environ.setdefault("BENCH_PRESET", "14b")
        os.environ.setdefault("BENCH_MODE", "e2e")
        os.environ.setdefault("BENCH_MM", "int4a8")
        os.environ.setdefault("BENCH_ATTN", "sparge")
        os.environ.setdefault("BENCH_ROPE_FUSED", "1")
        os.environ.setdefault("BENCH_VAE", "full")  # untiled fits after release
        os.environ.setdefault("BENCH_STEPS", "2")
        # tuned per-layer sparge table + dense prefix for the tuner-failed
        # layer 0 (round-5 part 13: 31.17 s vs 32.15 s uniform-l1, same
        # protocol, WITH a 25 dB per-layer quality bar)
        os.environ.setdefault(
            "BENCH_SPARGE_TABLE",
            "configs/sparge/wan_t2v_14b_structured_keep03.npz")
        # protocol-complete: T5 encode in the timed e2e (measured 32.18 s
        # = 2.186x, BENCHLOG_r04 part 12 — encode is 0.4% of wall-clock
        # and the row is strictly better AND more complete than the
        # encode-excluded 32.90 s row)
        os.environ.setdefault("BENCH_INCLUDE_ENCODE", "1")

    preset = os.environ.get("BENCH_PRESET", "1.3b")
    mode = os.environ.get("BENCH_MODE", "forward")
    if preset == "tiny":
        arch = WanArch(dim=256, ffn_dim=512, num_heads=4, num_layers=4,
                       in_dim=16, out_dim=16, text_len=64, text_dim=256)
        f, h, w = 5, 20, 20
    else:
        kw = PRESETS["wan2.1_14b"] if preset == "14b" else PRESETS["wan2.1_1.3b"]
        arch = WanArch(**kw, in_dim=16, out_dim=16, freq_dim=256, text_len=512, text_dim=4096)
        # 480P 5s: 81 frames -> 21 latent frames; 480x832 -> 60x104 latent
        f = int(os.environ.get("BENCH_FRAMES", 21))
        h = int(os.environ.get("BENCH_H", 60))
        w = int(os.environ.get("BENCH_W", 104))

    attn = os.environ.get("BENCH_ATTN", "flash_attn3")
    mm_env = os.environ.get("BENCH_MM", "Default")
    low = mm_env.lower()
    # order matters: full registry aliases contain multiple substrings
    # (the w4a8 alias has both "int4" and "int8"; block-128 aliases say
    # "block128" with a hyphen, never the literal "fp8_block128")
    if "block128" in low or "fp8_block128" in low:
        alias = "fp8_block128"
    elif "int4" in low:
        alias = "int4a8" if ("a8" in low or "int8" in low) else "int4"
    elif "int8" in low:
        alias = "int8"
    elif "fp8" in low:
        alias = "fp8"
    else:
        alias = "bf16"
    scheme = "int4" if alias == "int4a8" else alias  # same packed-int4 ckpt
    mm_type = MM_ALIAS.get(alias, mm_env)
    if alias == "bf16":
        mm_type = "Default" if low in ("default", "bf16") else mm_env
    steps = int(os.environ.get("BENCH_STEPS", 3))

    target = (16, f, h, w)
    # the reference's headline 14B rows are I2V (BASELINE.md header):
    # BENCH_TASK=i2v adds the 20ch mask/frame concat + CLIP img cross-attn
    # (k_img/v_img + 257 img context tokens) the i2v forward carries
    task = os.environ.get("BENCH_TASK", "t2v")
    if task == "i2v":
        arch = dataclasses.replace(arch, task="i2v", in_dim=36)
    # in-kernel fused rope is numerically equivalent (shared q/k feature
    # permutation; irrelevant for synthetic weights); measured faster on
    # v5e for bf16/int8/fp8 forwards and the w4a8 e2e (37.12 -> 35.64 s)
    # — default on for all schemes, opt out with BENCH_ROPE_FUSED=0
    rf = os.environ.get("BENCH_ROPE_FUSED", "")
    if rf != "0":
        arch = dataclasses.replace(arch, rope_fused=True)
    params = init_random_params_on_device(arch, scheme=scheme, seed=0)
    jax.block_until_ready(params)

    if mode == "e2e":
        resynth = lambda: init_random_params_on_device(arch, scheme=scheme, seed=0)
        run_e2e(arch, params, target, mm_type, attn, steps, preset, alias, resynth)
        return

    rope_cos, rope_sin, seq_len = rope_for_shape(arch, target)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((1, *target)) * 0.5, jnp.bfloat16)
    t = jnp.asarray([500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)
    y = clip_fea = None
    if task == "i2v":
        y = jnp.asarray(rng.standard_normal((1, arch.in_dim - 16, f, h, w)) * 0.5, jnp.bfloat16)
        clip_fea = jnp.asarray(rng.standard_normal((1, 257, arch.clip_dim)) * 0.1, jnp.bfloat16)

    cross = "flash_attn3" if attn in ("sparge", "radial_attn") else attn
    self_attn_kwargs = None
    sparse_blocks = {
        "block_q": int(os.environ.get("BENCH_SPARSE_BQ", 2048)),
        "block_k": int(os.environ.get("BENCH_SPARSE_BK", 1024)),
    }
    if attn == "radial_attn":
        from lightx2v_tpu.ops.radial import MaskMap

        pt, ph, pw = arch.patch_size
        gf = f // pt
        self_attn_kwargs = {"mask_map": MaskMap(video_token_num=gf * (h // ph) * (w // pw),
                                                num_frame=gf), "decay_factor": 0.5,
                            **sparse_blocks}
    elif attn == "sparge":
        self_attn_kwargs = {"keep_ratio": float(os.environ.get("BENCH_SPARGE_KEEP", 0.3)),
                            "l1": 0.07, **sparse_blocks}
        if os.environ.get("BENCH_SPARGE_TABLE"):  # tuned per-layer l1 .npz
            _tab = np.load(os.environ["BENCH_SPARGE_TABLE"])
            self_attn_kwargs["l1_per_layer"] = _tab["l1"]
            if "passed" in _tab and not _tab["passed"][0]:
                # tuner-failed leading layers run dense (segmented scan)
                _pa = _tab["passed"]
                self_attn_kwargs["dense_prefix"] = (
                    int(np.argmax(_pa)) if _pa.any() else len(_pa))
    fwd = jax.jit(
        lambda p, l, tt, c: wan_forward(
            p, l, tt, c, rope_cos, rope_sin, arch, y=y, clip_fea=clip_fea,
            mm_type=mm_type, self_attn_type=attn, cross_attn_type=cross,
            self_attn_kwargs=self_attn_kwargs,
        )
    )
    # warmup/compile; sync by fetching a scalar (block_until_ready does not
    # actually block under the axon-tunneled backend)
    def run_sync():
        return float(jnp.sum(fwd(params, latents, t, context).astype(jnp.float32)))

    run_sync()
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1000.0)

    res = {(60, 104): "480p", (90, 160): "720p"}.get((h, w), f"{h}x{w}latent")
    label = alias if task == "t2v" else f"{alias},i2v"
    base = {
        ("14b", "480p"): H200_14B_480P_MS_PER_FORWARD,
        ("14b", "720p"): H200_14B_720P_MS_PER_FORWARD,
        ("1.3b", "480p"): H200_1P3B_480P_MS_PER_FORWARD,
    }.get((preset, res))
    if base is not None:
        raw = base / ms
        emit(
            f"wan{preset}_{res}_dit_forward_ms_on_v5e[{label}] (chip-normalized vs H200; raw ratio {raw:.3f})",
            ms, "ms", raw * PEAK_RATIO,
        )
    else:  # no published reference row at this shape: report time only
        emit(f"wan{preset}_{res}_dit_forward_ms_on_v5e[{label}] (no published H200 row)",
             ms, "ms", 0.0)


def run_hunyuan():
    """HunyuanVideo MMDiT forward at 480P-equivalent token counts
    (BASELINE config 4's model family; the reference publishes no H200
    per-forward number for Hunyuan, so the row reports time only).
    Full arch is ~12.7B params — bf16 exceeds one v5e, so the default
    scheme is int8 (every double/single block linear w8a8, like the Wan
    14B capacity configs). Weights synthesize on device."""
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.hunyuan.config import HunyuanArch
    from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward
    from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_params_on_device

    if jax.default_backend() == "tpu":
        os.environ.setdefault("LIGHTX2V_STRICT_KERNELS", "1")

    tiny = os.environ.get("BENCH_PRESET") == "tiny"  # CPU smoke of the paths
    if tiny:
        arch = HunyuanArch(hidden_size=96, heads_num=4, double_blocks=2,
                           single_blocks=2, mlp_hidden_dim=192, in_channels=16,
                           out_channels=16, text_states_dim=32,
                           text_states_dim_2=16, rope_dim_list=(4, 10, 10))
    else:
        arch = HunyuanArch()
    mm_env = os.environ.get("BENCH_MM", "bf16" if tiny else "int8")
    mm_type = MM_ALIAS.get(mm_env, "Default" if mm_env in ("bf16", "Default") else mm_env)
    scheme = "int4" if "int4" in mm_env else mm_env  # ckpt layout (w4a8 shares int4)
    attn = os.environ.get("BENCH_ATTN", "xla" if tiny else "flash_attn3")
    steps = int(os.environ.get("BENCH_STEPS", 3))
    f = int(os.environ.get("BENCH_FRAMES", 3 if tiny else 21))
    h = int(os.environ.get("BENCH_H", 8 if tiny else 60))
    w = int(os.environ.get("BENCH_W", 8 if tiny else 104))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", 16 if tiny else 256))

    params = init_random_hunyuan_params_on_device(arch, scheme=scheme, seed=0)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((1, arch.in_channels, f, h, w)) * 0.5, jnp.bfloat16)
    ts = jnp.asarray(rng.standard_normal((1, text_len, arch.text_states_dim)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((1, text_len), jnp.int32)
    ts2 = jnp.asarray(rng.standard_normal((1, arch.text_states_dim_2)) * 0.1, jnp.bfloat16)
    pt, ph, pw = arch.patch_size
    cos, sin = build_hunyuan_rope(arch, f // pt, h // ph, w // pw)
    t = jnp.asarray([500.0], jnp.float32)
    g = jnp.asarray([6000.0], jnp.float32)

    res = {(60, 104): "480p", (90, 160): "720p"}.get((h, w), f"{h}x{w}latent")

    if os.environ.get("BENCH_MODE") == "e2e":
        # capability row (no published H200 analog): n-step flow-match
        # Euler denoise + the Hunyuan tiled causal-VAE decode, DiT weights
        # released from HBM before decode like the Wan flagship protocol
        from lightx2v_tpu.schedulers.euler import FlowMatchEulerScheduler
        from lightx2v_tpu.utils.config import ConfigDict
        from lightx2v_tpu.utils.synth import device_randn_like
        from lightx2v_tpu.vae.hunyuan_vae import (HunyuanVAEConfig,
                                                  hunyuan_vae_decode_tiled,
                                                  init_random_hunyuan_vae_state_dict,
                                                  load_hunyuan_vae_params)

        infer_steps = int(os.environ.get("BENCH_INFER_STEPS", 4))
        sched = FlowMatchEulerScheduler(ConfigDict(infer_steps=infer_steps, sample_shift=7.0))
        state0 = sched.prepare((arch.in_channels, f, h, w), seed=42)
        vae_cfg = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                                   latent_channels=16, norm_num_groups=4) if tiny \
            else HunyuanVAEConfig()
        vae_params = device_randn_like(load_hunyuan_vae_params(
            init_random_hunyuan_vae_state_dict(vae_cfg, seed=0), vae_cfg), seed=0)

        # BENCH_INCLUDE_ENCODE=1: protocol-complete row — the reference's
        # run_pipeline times the text encoders inside the run
        # (default_runner.py:202-221), and Hunyuan's stack is the heaviest
        # (llava-llama-3-8b hidden states + CLIP-L pooled). A REAL
        # 8B-llama-shaped encoder (int8 linears, ~7.5 GB — co-resident
        # with the w4a8 DiT on one v5e) + CLIP-L text tower are
        # synthesized on device; timed: llama+clip encode -> release both
        # -> denoise -> release DiT -> decode. Re-synthesis for the next
        # iteration is untimed (serving overlap), as in the Wan flagship.
        include_encode = os.environ.get("BENCH_INCLUDE_ENCODE") == "1"
        enc_state = {}
        if include_encode:
            from lightx2v_tpu.encoders.clip import (
                ClipTextArch, clip_text_forward,
                init_random_clip_text_params_on_device)
            from lightx2v_tpu.encoders.llama import (
                LLAVA_LLAMA3_8B, LlamaArch, init_random_llama_params_on_device,
                llama_encode_cropped)

            ll_arch = LlamaArch(vocab_size=128, dim=arch.text_states_dim,
                                num_layers=2, num_heads=4, num_kv_heads=2,
                                ffn_dim=2 * arch.text_states_dim,
                                crop_start=4) if tiny else LLAVA_LLAMA3_8B
            ct_arch = ClipTextArch(vocab_size=64, dim=arch.text_states_dim_2,
                                   num_heads=4, num_layers=2) if tiny else ClipTextArch()
            ll_scheme = os.environ.get("BENCH_LLAMA_SCHEME", "int8")

            def synth_encoders():
                lp = init_random_llama_params_on_device(ll_arch, scheme=ll_scheme, seed=7)
                cp = init_random_clip_text_params_on_device(ct_arch, seed=8)
                float(jnp.sum(lp["norm"].astype(jnp.float32)))  # order barrier
                enc_state["llama"], enc_state["clip"] = lp, cp

            synth_encoders()
            L_ids = ll_arch.crop_start + text_len
            ll_ids = jnp.asarray(rng.integers(1, ll_arch.vocab_size, (1, L_ids)), jnp.int32)
            ll_mask = jnp.asarray((np.arange(L_ids)[None] < ll_arch.crop_start + 77), jnp.int32)
            cids = rng.integers(1, ct_arch.vocab_size - 1, (1, min(77, ct_arch.max_positions)))
            cids[0, 20] = ct_arch.vocab_size - 1  # eot
            cids[0, 21:] = 0
            c_ids = jnp.asarray(cids, jnp.int32)
            c_mask = jnp.asarray((cids != 0), jnp.int32)
            llama_fn = jax.jit(lambda p: llama_encode_cropped(p, ll_ids, ll_mask, ll_arch))
            clip_fn = jax.jit(lambda p: clip_text_forward(p, c_ids, c_mask, ct_arch)[1])

        def one_step(p, st, tss, msk, ts2_):
            lat_b, tt = sched.step_pre(st)
            pred = hunyuan_forward(p, lat_b[None], tt[None].astype(jnp.float32),
                                   tss, msk, ts2_, cos, sin, arch, guidance=g,
                                   mm_type=mm_type, attn_type=attn)
            return sched.step_post(st, pred[0])

        step_fn = jax.jit(one_step)
        # per-tile jitted programs (tile_jit): one whole-grid program OOMs
        # at 46.85 GB on v5e (see hunyuan_vae_decode_spatial_tiled).
        # BENCH_VAE=ttile decodes FULL spatial frames in small temporal
        # tiles (no spatial halo redundancy — decode-after-release frees
        # the HBM that makes this possible); BENCH_VAE_TTILE/STILE size
        # the tiles.
        tt = int(os.environ.get("BENCH_VAE_TTILE", 16))
        st = int(os.environ.get("BENCH_VAE_STILE", 32))
        use_sp = False if os.environ.get("BENCH_VAE") == "ttile" else None
        decode = lambda vp, z: hunyuan_vae_decode_tiled(
            vp, z, vae_cfg, scale=False, t_tile_latent=tt,
            spatial_tile_latent=st, use_spatial=use_sp, tile_jit=True)

        def once(p):
            tss, msk, ts2_ = ts, mask, ts2
            if include_encode:
                t_enc = time.perf_counter()
                tss, msk = llama_fn(enc_state["llama"])
                ts2_ = clip_fn(enc_state["clip"]).astype(jnp.bfloat16)
                float(jnp.sum(tss.astype(jnp.float32)))  # sync: honest split
                print(json.dumps({"split_encode_s":
                                  round(time.perf_counter() - t_enc, 3)}), flush=True)
                for leaf in jax.tree_util.tree_leaves(
                        (enc_state["llama"], enc_state["clip"])):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
            st = state0
            for _ in range(infer_steps):
                st = step_fn(p, st, tss, msk, ts2_)
            z = jnp.transpose(st["latents"], (1, 2, 3, 0))[None]
            float(jnp.sum(z.astype(jnp.float32)))  # sync before release
            t_mid = time.perf_counter()
            for leaf in jax.tree_util.tree_leaves(p):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            out = float(jnp.sum(decode(vae_params, z).astype(jnp.float32)))
            print(json.dumps({"split_decode_s": round(time.perf_counter() - t_mid, 2)}),
                  flush=True)
            return out

        once(params)
        times = []
        for _ in range(steps):
            params = init_random_hunyuan_params_on_device(arch, scheme=scheme, seed=0)
            if include_encode:
                synth_encoders()  # next request's encoder re-stage (untimed)
            float(jnp.sum(jax.tree_util.tree_leaves(params)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            once(params)
            times.append(time.perf_counter() - t0)
        stages = ("llama+clip encode+" if include_encode else "") + "denoise+tiledVAE+release"
        emit(f"hunyuan_{res}_e2e{infer_steps}step_s_on_v5e[{mm_env}] ({stages}; capability row, no published H200 analog)",
             float(np.median(times)), "s", 0.0)
        return

    fwd = jax.jit(lambda p, l, tt: hunyuan_forward(
        p, l, tt, ts, mask, ts2, cos, sin, arch, guidance=g,
        mm_type=mm_type, attn_type=attn))

    def run_sync():
        return float(jnp.sum(fwd(params, latents, t).astype(jnp.float32)))

    run_sync()
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1000.0)
    emit(f"hunyuan_{res}_dit_forward_ms_on_v5e[{mm_env}] (no published H200 row)",
         ms, "ms", 0.0)


def run_cogvideox():
    """CogVideoX1.5-5B forward at 480P-equivalent token counts (third
    model family; the reference publishes no H200 per-forward number, so
    the row reports time only). 5B bf16 (~10 GB) is resident on one v5e;
    BENCH_MM=int8/fp8 quantizes the block linears. On-device weights."""
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.cogvideox.model import (CogArch, build_cog_rope,
                                                     cog_forward,
                                                     init_random_cog_params_on_device)

    if jax.default_backend() == "tpu":
        os.environ.setdefault("LIGHTX2V_STRICT_KERNELS", "1")

    tiny = os.environ.get("BENCH_PRESET") == "tiny"  # CPU smoke of the paths
    if tiny:
        arch = CogArch(num_layers=2, num_heads=4, head_dim=16, text_len=16,
                       text_dim=32)
    else:
        arch = CogArch()
    scheme = os.environ.get("BENCH_MM", "bf16")
    mm_type = MM_ALIAS.get(scheme, "Default" if scheme in ("bf16", "Default") else scheme)
    attn = os.environ.get("BENCH_ATTN", "xla" if tiny else "flash_attn3")
    steps = int(os.environ.get("BENCH_STEPS", 3))
    f = int(os.environ.get("BENCH_FRAMES", 3 if tiny else 21))
    h = int(os.environ.get("BENCH_H", 8 if tiny else 60))
    w = int(os.environ.get("BENCH_W", 8 if tiny else 104))

    params = init_random_cog_params_on_device(arch, scheme=scheme, seed=0)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((1, arch.in_channels, f, h, w)) * 0.5, jnp.bfloat16)
    context = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)
    p, pt = arch.patch_size, arch.patch_size_t
    fpad = f + ((-f) % pt)
    cos, sin = build_cog_rope(arch, fpad // pt, h // p, w // p)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    t = jnp.asarray([500.0], jnp.float32)

    res = {(60, 104): "480p", (90, 160): "720p"}.get((h, w), f"{h}x{w}latent")

    if os.environ.get("BENCH_MODE") == "e2e":
        # capability row: n-step XDPM (v-pred, zero-terminal-SNR) denoise +
        # the spatially tiled CogVideoX VAE decode, weights released first
        from lightx2v_tpu.schedulers.cogvideox import CogvideoxXDPMScheduler
        from lightx2v_tpu.utils.config import ConfigDict
        from lightx2v_tpu.utils.synth import device_randn_like
        from lightx2v_tpu.vae.cogvideox_vae import (CogVAEConfig,
                                                    cog_vae_decode_tiled,
                                                    init_random_cog_vae_state_dict,
                                                    load_cog_vae_params)

        infer_steps = int(os.environ.get("BENCH_INFER_STEPS", 4))
        sched = CogvideoxXDPMScheduler(ConfigDict(infer_steps=infer_steps))
        state0 = sched.prepare((arch.in_channels, f, h, w), seed=42)
        vae_cfg = CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                               latent_channels=16, norm_num_groups=4) if tiny \
            else CogVAEConfig()
        vae_params = device_randn_like(load_cog_vae_params(
            init_random_cog_vae_state_dict(vae_cfg, seed=0), vae_cfg), seed=0)

        # BENCH_INCLUDE_ENCODE=1: protocol-complete row — T5-v1.1-xxl
        # encode (shared relative-position bias, 226 tokens; the Cog
        # runner's real encoder config) inside the timed region, released
        # before denoise. int8 linears: ~4.8 GB beside the 5B DiT.
        include_encode = os.environ.get("BENCH_INCLUDE_ENCODE") == "1"
        enc_state = {}
        if include_encode:
            from lightx2v_tpu.encoders.t5 import (T5Config,
                                                  init_random_t5_params_on_device,
                                                  t5_encode)

            t5_cfg = T5Config(vocab_size=128, dim=arch.text_dim,
                              dim_attn=arch.text_dim, dim_ffn=2 * arch.text_dim,
                              num_heads=4, num_layers=2, shared_pos=True) if tiny \
                else T5Config(vocab_size=32128, dim=4096, dim_attn=4096,
                              dim_ffn=10240, num_heads=64, num_layers=24,
                              shared_pos=True)
            t5_scheme = os.environ.get("BENCH_T5_SCHEME", "int8")

            def synth_t5():
                p = init_random_t5_params_on_device(t5_cfg, scheme=t5_scheme, seed=7)
                float(jnp.sum(p["norm"].astype(jnp.float32)))  # order barrier
                enc_state["t5"] = p

            synth_t5()
            t5_ids = jnp.asarray(rng.integers(0, t5_cfg.vocab_size,
                                              (1, arch.text_len)), jnp.int32)
            t5_mask = jnp.asarray((np.arange(arch.text_len)[None] < 77), jnp.int32)
            encode_fn = jax.jit(lambda p: t5_encode(p, t5_ids, t5_mask, t5_cfg))

        def one_step(pa, st, ctx):
            lat_b, tt = sched.step_pre(st)
            pred = cog_forward(pa, lat_b[None], tt[None].astype(jnp.float32),
                               ctx, cos, sin, arch, mm_type=mm_type,
                               attn_type=attn)
            return sched.step_post(st, pred[0])

        step_fn = jax.jit(one_step)
        # tiled + frame-batched decode (the reference's own decode loop,
        # num_latent_frames_batch_size=2): the one-program tile grid OOMed
        # at 73.76 GB, whole-clip single-tile programs at 23 GB (81-frame
        # f32 maps) — chunked tiles peak at one 2-latent-frame chunk.
        # BENCH_VAE=full decodes full-frame chunked (no spatial tiling).
        fb = int(os.environ.get("BENCH_VAE_FRAME_BATCH", 2))
        if os.environ.get("BENCH_VAE") == "full":
            from lightx2v_tpu.vae.cogvideox_vae import cog_vae_decode_chunked
            decode = lambda vp, z: cog_vae_decode_chunked(vp, z, vae_cfg,
                                                          scale=False, frame_batch=fb)
        else:
            # BENCH_VAE_TILE / BENCH_VAE_OVERLAP: tile redundancy is
            # (tile/step)^2 — overlap 0.25 costs 1.78x conv work, 0.125
            # costs 1.31x (the reference's own tiling uses ~1/6)
            tile = int(os.environ.get("BENCH_VAE_TILE", 32))
            ov = float(os.environ.get("BENCH_VAE_OVERLAP", 0.25))
            decode = lambda vp, z: cog_vae_decode_tiled(vp, z, vae_cfg, scale=False,
                                                        tile_latent=tile, overlap=ov,
                                                        frame_batch=fb)

        def once(pa):
            ctx = context
            if include_encode:
                t_enc = time.perf_counter()
                ctx = encode_fn(enc_state["t5"])
                float(jnp.sum(ctx.astype(jnp.float32)))  # sync: honest split
                print(json.dumps({"split_encode_s":
                                  round(time.perf_counter() - t_enc, 3)}), flush=True)
                for leaf in jax.tree_util.tree_leaves(enc_state["t5"]):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
            st = state0
            for _ in range(infer_steps):
                st = step_fn(pa, st, ctx)
            z = jnp.transpose(st["latents"], (1, 2, 3, 0))[None]
            float(jnp.sum(z.astype(jnp.float32)))  # sync before release
            t_mid = time.perf_counter()
            for leaf in jax.tree_util.tree_leaves(pa):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            out = float(jnp.sum(decode(vae_params, z).astype(jnp.float32)))
            print(json.dumps({"split_decode_s": round(time.perf_counter() - t_mid, 2)}),
                  flush=True)
            return out

        once(params)
        times = []
        for _ in range(steps):
            params = init_random_cog_params_on_device(arch, scheme=scheme, seed=0)
            if include_encode:
                synth_t5()  # next request's encoder re-stage (untimed)
            float(jnp.sum(jax.tree_util.tree_leaves(params)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            once(params)
            times.append(time.perf_counter() - t0)
        stages = ("t5encode+" if include_encode else "") + "denoise+tiledVAE+release"
        emit(f"cogvideox_{res}_e2e{infer_steps}step_s_on_v5e[{scheme}] ({stages}; capability row, no published H200 analog)",
             float(np.median(times)), "s", 0.0)
        return

    fwd = jax.jit(lambda pa, l, tt: cog_forward(
        pa, l, tt, context, cos, sin, arch, mm_type=mm_type, attn_type=attn))

    def run_sync():
        return float(jnp.sum(fwd(params, latents, t).astype(jnp.float32)))

    run_sync()
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1000.0)
    emit(f"cogvideox_{res}_dit_forward_ms_on_v5e[{scheme}] (no published H200 row)",
         ms, "ms", 0.0)


def run_e2e(arch, params, target, mm_type, attn, steps, preset="14b",
            scheme="bf16", resynth=None):
    """4-step CFG-free distill denoise + VAE decode, wall-clock seconds —
    the reference's LightX2V_3-Distill e2e protocol
    (benchmark_source.md:36; the 40-step CFG rows are covered by the
    per-forward metric x80). T5 encode is excluded by default (<1% of
    the denoise FLOPs); BENCH_INCLUDE_ENCODE=1 folds it into the timed
    region with a real UMT5-XXL-shaped int8 encoder synthesized on
    device (encode -> release T5 -> denoise -> release DiT -> decode —
    the one-v5e capacity sequence; both models cannot sit beside the
    denoise activations).

    BENCH_RELEASE=1 (default for e2e): after the last denoise step the
    DiT weights are released from HBM before decode — the realistic
    serving sequence (decode happens once per generation, after the
    denoiser no longer needs its weights), and the capacity unlock that
    lets the UNTILED decode (1.78x less conv work than tiled) fit
    beside a 14B model on one v5e. The release (buffer deletes) is
    inside the timed region; re-synthesis for the next timed iteration
    happens outside it, mirroring serving where the next request's
    weight re-stage overlaps its encode phase. Opt out: BENCH_RELEASE=0."""
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.schedulers.step_distill import WanStepDistillScheduler
    from lightx2v_tpu.utils.config import ConfigDict
    from lightx2v_tpu.vae.wan_vae import (WanVAEConfig, init_random_vae_state_dict,
                                          load_wan_vae_params, vae_decode_tiled)

    sched_cfg = ConfigDict(
        infer_steps=4, denoising_step_list=[1000, 750, 500, 250], sample_shift=5.0)
    sched = WanStepDistillScheduler(sched_cfg)
    state0 = sched.prepare(target, seed=42)
    cross = "flash_attn3" if attn in ("sparge", "radial_attn") else attn
    self_attn_kwargs = None
    if attn == "sparge":
        self_attn_kwargs = {
            "keep_ratio": float(os.environ.get("BENCH_SPARGE_KEEP", 0.3)),
            "l1": 0.07,
            "block_q": int(os.environ.get("BENCH_SPARSE_BQ", 2048)),
            "block_k": int(os.environ.get("BENCH_SPARSE_BK", 1024)),
        }
        if os.environ.get("BENCH_SPARGE_TABLE"):  # tuned per-layer l1 .npz
            _tab = np.load(os.environ["BENCH_SPARGE_TABLE"])
            self_attn_kwargs["l1_per_layer"] = _tab["l1"]
            if "passed" in _tab and not _tab["passed"][0]:
                # tuner-failed leading layers run dense (segmented scan)
                _pa = _tab["passed"]
                self_attn_kwargs["dense_prefix"] = (
                    int(np.argmax(_pa)) if _pa.any() else len(_pa))
    denoise = make_denoise_fn(
        arch, sched, target, enable_cfg=False, mm_type=mm_type,
        self_attn_type=attn, cross_attn_type=cross,
        self_attn_kwargs=self_attn_kwargs,
    )
    rng = np.random.default_rng(0)
    context = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)

    # BENCH_INCLUDE_ENCODE=1: fold the T5 encode stage into the timed
    # region — a REAL UMT5-XXL-shaped encoder (int8 linears), synthesized
    # on device, encodes the prompt ids and is then released from HBM
    # before the denoise (the capacity sequence on one v5e: T5 int8
    # ~6.7 GB + 14B w4a8 ~7.5 GB both fit, but not beside denoise
    # activations). Closes the standing "e2e excludes T5" caveat with a
    # measured number instead of the <1%-of-FLOPs argument.
    include_encode = os.environ.get("BENCH_INCLUDE_ENCODE") == "1"
    t5_state = {}
    if include_encode:
        from lightx2v_tpu.encoders.t5 import (UMT5_XXL, T5Config,
                                              init_random_t5_params_on_device,
                                              t5_encode)

        # tiny preset: T5 dim must match arch.text_dim (context feeds the DiT)
        t5_cfg = UMT5_XXL if preset in ("14b", "1.3b") else T5Config(
            vocab_size=1024, dim=arch.text_dim, dim_attn=arch.text_dim,
            dim_ffn=2 * arch.text_dim, num_heads=4, num_layers=2)
        t5_scheme = os.environ.get("BENCH_T5_SCHEME", "int8")

        def synth_t5():
            p = init_random_t5_params_on_device(t5_cfg, scheme=t5_scheme, seed=7)
            float(jnp.sum(p["norm"].astype(jnp.float32)))  # order barrier
            return p

        t5_state["params"] = synth_t5()
        ids_np = rng.integers(0, t5_cfg.vocab_size, (1, arch.text_len))
        mask_np = (np.arange(arch.text_len)[None] < 77).astype(np.int32)
        t5_ids = jnp.asarray(ids_np, jnp.int32)
        t5_mask = jnp.asarray(mask_np)
        encode_fn = jax.jit(lambda p: t5_encode(p, t5_ids, t5_mask, t5_cfg))

    y = clip_fea = None
    if arch.task == "i2v":
        _, f, h, w = target
        y = jnp.asarray(rng.standard_normal((1, arch.in_dim - 16, f, h, w)) * 0.5, jnp.bfloat16)
        clip_fea = jnp.asarray(rng.standard_normal((1, 257, arch.clip_dim)) * 0.1, jnp.bfloat16)

    vae_cfg = WanVAEConfig()
    import ml_dtypes

    from lightx2v_tpu.utils.synth import device_randn_like

    # host numpy tree as a shape template, arrays generated ON DEVICE
    # (~250 MB bf16 would take minutes through the tunnel); the params
    # tree carries static layer-type tags, so decode runs op-by-op like
    # the runner does (each conv is its own XLA program)
    vae_params = device_randn_like(load_wan_vae_params(
        init_random_vae_state_dict(vae_cfg, seed=0), vae_cfg,
        dtype=ml_dtypes.bfloat16, to_jax=False), seed=0)

    # BENCH_VAE_INT8=1: per-output-channel int8 decoder convs on the MXU
    # (2x bf16 conv throughput on v5e; quantize_vae_decoder_int8 keeps
    # head_conv + mid-attention in bf16). Quality bound: fidelity ladder
    # "vae-int8" rung (scripts/bench/bench_fidelity.py).
    vae_int8 = os.environ.get("BENCH_VAE_INT8") == "1"
    if vae_int8:
        from lightx2v_tpu.vae.wan_vae import quantize_vae_decoder_int8
        vae_params = quantize_vae_decoder_int8(vae_params)
        jax.block_until_ready([l for l in jax.tree_util.tree_leaves(vae_params)
                               if hasattr(l, "shape")])

    # host-stepped: one device execution per denoise step + ONE jitted
    # program for the whole VAE decode — a whole-pipeline program is a
    # single multi-10s device call, which exceeds the axon tunnel's
    # per-execute deadline at 14B; and an UN-jitted decode dispatches
    # every conv as its own tunneled call (measured: 501 s e2e of which
    # ~480 s was per-op dispatch latency). The params tree carries string
    # layer tags which can't cross jit as arguments, so array leaves ride
    # as args and the tags stay in the closure.
    step_fn = jax.jit(denoise.one_step)
    flat, treedef = jax.tree_util.tree_flatten(
        vae_params, is_leaf=lambda x: isinstance(x, str))
    arr_idx = [i for i, l in enumerate(flat) if hasattr(l, "shape")]

    vae_mode = os.environ.get("BENCH_VAE", "tiled")  # tiled | full
    vae_chunk = int(os.environ.get("BENCH_VAE_CHUNK", 4))
    # tile/stride in latent px (defaults = reference 256px/192px); after
    # decode-after-release bigger tiles trade redundant halo conv work
    # ((tile/stride)^2) against per-tile activation memory
    vae_tile = int(os.environ.get("BENCH_VAE_TILE", 32))
    vae_stride = int(os.environ.get("BENCH_VAE_STRIDE", 24))

    @jax.jit
    def decode(z, *arrs):
        leaves = list(flat)
        for i, a in zip(arr_idx, arrs):
            leaves[i] = a
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        if vae_mode == "full":
            from lightx2v_tpu.vae.wan_vae import vae_decode
            return vae_decode(p, z, vae_cfg, dtype=jnp.bfloat16, chunk=vae_chunk)
        return vae_decode_tiled(p, z, vae_cfg, dtype=jnp.bfloat16, chunk=vae_chunk,
                                tile_latent=vae_tile, stride_latent=vae_stride)

    vae_arrs = [flat[i] for i in arr_idx]

    split = os.environ.get("BENCH_E2E_SPLIT") == "1"
    release = os.environ.get("BENCH_RELEASE", "1") == "1" and resynth is not None

    def once(p):
        ctx = context
        if include_encode:
            t_enc = time.perf_counter()
            ctx = encode_fn(t5_state["params"])
            float(jnp.sum(ctx.astype(jnp.float32)))  # sync: honest stage split
            if split:
                print(json.dumps({"split_encode_s": round(time.perf_counter() - t_enc, 3)}),
                      flush=True)
            if release:  # free the T5 for denoise
                for leaf in jax.tree_util.tree_leaves(t5_state["params"]):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
        st, cache = state0, denoise.init_cache()
        for _ in range(sched_cfg["infer_steps"]):
            st, cache = step_fn(p, st, cache, ctx, ctx, y, clip_fea)
        z = jnp.transpose(st["latents"], (1, 2, 3, 0))[None]  # (1,T,h,w,C)
        if split or release:  # sync BEFORE release/clock so attribution is real
            denoise_sum = float(jnp.sum(z.astype(jnp.float32)))
            t_mid = (time.perf_counter(), denoise_sum)
        if release:  # drop DiT weights from HBM before decode (timed: deletes are cheap)
            for leaf in jax.tree_util.tree_leaves(p):
                if hasattr(leaf, "delete"):
                    leaf.delete()
        frames = decode(z, *vae_arrs)
        out = float(jnp.sum(frames.astype(jnp.float32)))
        if split:
            print(json.dumps({"split_decode_s": round(time.perf_counter() - t_mid[0], 2)}),
                  flush=True)
        return out

    def fresh_params():
        if include_encode and release:  # next request's T5 re-stage (untimed)
            t5_state["params"] = synth_t5()
        p = resynth()
        # device executes programs in order; fetching a value enqueued after
        # all init programs guarantees re-synthesis finished before t0
        float(jnp.sum(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)))
        return p

    once(params)  # compile
    times = []
    for _ in range(steps):
        if release:
            params = fresh_params()
        t0 = time.perf_counter()
        once(params)
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    res = {(60, 104): "480p", (90, 160): "720p"}.get(tuple(target[2:]), "custom")
    base_s = {"480p": H200_14B_480P_DISTILL_E2E_S,
              "720p": H200_14B_720P_DISTILL_E2E_S}.get(res)
    label = scheme if arch.task == "t2v" else f"{scheme},i2v"
    vae_lbl = "fullVAE" if os.environ.get("BENCH_VAE") == "full" else "tiledVAE"
    if release:
        vae_lbl += "+release"
    if vae_int8:
        vae_lbl += "+int8vae"
    stages = ("t5encode+" if include_encode else "") + f"denoise+{vae_lbl}"
    if preset == "14b" and base_s is not None:
        raw = base_s / sec
        emit(
            f"wan{preset}_distill4_{res}_e2e_s_on_v5e[{label}] ({stages}; chip-normalized vs {base_s:.0f}s H200 14B; raw ratio {raw:.3f})",
            sec, "s", raw * PEAK_RATIO,
        )
    else:
        emit(f"wan{preset}_distill4_{res}_e2e_s_on_v5e[{label}] (no published H200 row)",
             sec, "s", 0.0)


if __name__ == "__main__":
    main()
