"""Per-layer sparge l1 tuning — the reference's ``sparge_ckpt`` workflow.

The reference loads per-layer tuned (l1, pv_l1) sparge hyperparameters
from a checkpoint (lightx2v/common/ops/attn/attn_weight.py:242-291,
transformer_weights.py:183-190); the tuning itself happens offline in the
SpargeAttn project by searching hyperparameters per layer against an
output-similarity bar. This tool is the TPU-native analog:

1. ONE calibration forward runs the block stack layer by layer on the
   DENSE attention trajectory, capturing each layer's post-rope
   (q, k, v) at the video self-attention site.
2. Per layer, candidates from ``l1_grid`` are evaluated DESCENDING
   (larger l1 = more softmax mass skipped = cheaper); the first whose
   sparse output keeps SNR >= ``bar_db`` vs the dense output wins. If
   none passes, the layer falls back to l1=0.0 — the densest selection
   the keep_ratio cap allows (every row keeps its full top-k budget) —
   and is flagged in the emitted table.
3. The result is written as an .npz with an ``l1`` (num_layers,) table —
   exactly what the ``sparge_ckpt`` config key consumes
   (runners/wan_runner.py _self_attn_setup).

Run on real checkpoints with real prompt latents for production tables;
``--synthetic`` exists for smoke/protocol validation (synthetic gaussian
weights flatten block importance, so tables tuned from them are NOT
production tables — see scripts/bench/bench_fidelity.py docstring).
"""

from __future__ import annotations

import argparse
import json
from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.config import PRESETS, WanArch
from ..models.wan.model import wan_block, wan_pre_process
from ..models.wan.pipeline import rope_for_shape
from ..ops.attention import attention
from ..ops.linear import resolve_mm
from ..ops.sparge import sparge_attention, sparge_attention_xla

DEFAULT_L1_GRID = (0.30, 0.25, 0.20, 0.15, 0.10, 0.07, 0.05, 0.02)


@lru_cache(maxsize=None)
def _grid_eval_fn(keep_ratio: float, block_q: int, block_k: int, on_tpu: bool,
                  head_chunk: int = 0):
    """Jitted whole-grid sparse eval returning per-candidate SNR SCALARS.

    Two memory/bandwidth constraints shape this (both hit in round 5):
    * the dense-mask XLA sparge fallback materializes f32[B,N,S,S] logits
      — 51.5 GB at 1.3B full 480P tokens (S=32760), an instant compile
      OOM — so on TPU the eval runs the production Pallas block-sparse
      kernel (the very path the table feeds);
    * fetching per-candidate outputs to host for numpy SNR moves ~100 MB
      per eval through the single-digit-MB/s axon tunnel — so the SNR is
      computed on device over the whole l1 grid (lax.map; l1 only enters
      the cumulative-mass count, so it traces fine) and only (len(grid),)
      f32 scalars cross the tunnel per layer.

    ``head_chunk > 0`` evaluates ``head_chunk`` heads at a time
    (fori_loop accumulating sum-of-squares; sparge selection is
    per-(batch, head) independent, so the result is IDENTICAL to the
    whole-tensor eval — ratio of sums == ratio of means). This is the
    capacity fix for the native-720P tune (round-5 part 16): the
    unchunked eval's f32 temps (ref + out + all-head selection indices,
    ~4 GB at S=75 600, N=40) OOM beside 7 GB of w4a8 weights; chunking
    at 8 heads cuts them 5x. NOTE compute, not memory, is the 720P
    tune's real wall: the grid costs ~5.3x the 480P tune's ~4 h."""
    sparse = sparge_attention if on_tpu else sparge_attention_xla

    @jax.jit
    def eval_grid(q, k, v, dense_out, l1_vec):
        if not head_chunk:
            ref = dense_out.astype(jnp.float32)
            sig = jnp.mean(ref**2)

            def one(l1):
                out = sparse(q, k, v, keep_ratio=keep_ratio, l1=l1,
                             block_q=block_q, block_k=block_k)
                err = jnp.mean((out.astype(jnp.float32) - ref) ** 2)
                return 10.0 * jnp.log10(sig / jnp.maximum(err, 1e-30))

            return jax.lax.map(one, l1_vec)

        n = q.shape[2]  # (B, S, N, D) — heads on axis 2
        if n % head_chunk:
            raise ValueError(f"head_chunk={head_chunk} must divide num_heads={n}")

        def one(l1):
            def chunk(c, acc):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(
                    a, c * head_chunk, head_chunk, axis=2)
                out = sparse(sl(q), sl(k), sl(v), keep_ratio=keep_ratio, l1=l1,
                             block_q=block_q, block_k=block_k)
                ref = sl(dense_out).astype(jnp.float32)
                return (acc[0] + jnp.sum((out.astype(jnp.float32) - ref) ** 2),
                        acc[1] + jnp.sum(ref**2))

            err, sig = jax.lax.fori_loop(
                0, n // head_chunk, chunk,
                (jnp.float32(0.0), jnp.float32(0.0)))
            return 10.0 * jnp.log10(sig / jnp.maximum(err, 1e-30))

        return jax.lax.map(one, l1_vec)

    return eval_grid


def tune_layer(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dense_out: jnp.ndarray,
    keep_ratio: float,
    l1_grid: Sequence[float],
    bar_db: float,
    block_q: int,
    block_k: int,
    head_chunk: int = 0,
) -> Tuple[float, float, bool]:
    """Pick the largest l1 whose sparse output meets the SNR bar.

    Returns (l1, snr_db_at_l1, passed). Evaluation runs the Pallas
    block-sparse kernel on TPU (identical selection math to the XLA
    fallback used on CPU). A terminal l1=0.0 candidate is always
    evaluated: if no grid point meets the bar the layer falls back to
    the densest selection the keep cap allows (l1=0 keeps every row's
    full top-k budget), which strictly dominates any positive l1."""
    grid = sorted(set(l1_grid) | {0.0}, reverse=True)  # larger l1 = cheaper
    eval_fn = _grid_eval_fn(keep_ratio, block_q, block_k,
                            jax.default_backend() == "tpu", head_chunk)
    snrs = np.asarray(eval_fn(q, k, v, dense_out,
                              jnp.asarray(grid, jnp.float32)))
    for l1, s in zip(grid, snrs):
        if s >= bar_db:
            return float(l1), float(s), True
    return 0.0, float(snrs[-1]), False


def tune_sparge(
    params,
    arch: WanArch,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    *,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    keep_ratio: float = 0.3,
    l1_grid: Sequence[float] = DEFAULT_L1_GRID,
    bar_db: float = 30.0,
    block_q: int = 2048,
    block_k: int = 1024,
    head_chunk: int = 0,
    verbose: bool = True,
):
    """Calibrate a per-layer l1 table on one (latents, t, context) sample.

    The calibration trajectory is DENSE: every layer's input is the dense
    stack's activation, so per-layer tuning is independent of earlier
    layers' sparsity choices (the reference tunes against the dense model
    the same way). Returns (l1 (L,) np.float32, snrs (L,), passed (L,) bool)."""
    target = latents.shape[1:]
    rope_cos, rope_sin, _ = rope_for_shape(arch, target)
    rope_cos, rope_sin = jnp.asarray(rope_cos), jnp.asarray(rope_sin)

    x, embed, embed0, ctx, ctx_img, grid, s_tokens = wan_pre_process(
        params, latents, t, context, arch, y=y, clip_fea=clip_fea)
    mm_fn = resolve_mm(mm_type)
    # flash for the capture stack: dense xla attention materializes
    # f32[N,S,S] logits (51.5 GB at 1.3B full 480P tokens) — flash is
    # exact attention and fits at any S
    cross_fn = partial(attention, "flash_attn3")

    # ONE jitted program per layer step (layers share shapes, so it
    # compiles once and is re-executed per layer): eager per-op dispatch
    # through the axon tunnel costs ~0.2-0.5 s PER OP (NEXT_STEPS r4), so
    # the whole capture must be a single device call. The captured (q, k,
    # v, dense_out) tracers are threaded out as extra outputs.
    @jax.jit
    def layer_fwd(layer_p, x):
        cap = []

        def cap_fn(q, k, v, **kw):
            if "rope_cos" in kw:  # arch.rope_fused: rotate here, like every
                from ..ops.rope import apply_rope_half  # non-flash dispatch does

                q = apply_rope_half(q, kw["rope_cos"], kw["rope_sin"])
                k = apply_rope_half(k, kw["rope_cos"], kw["rope_sin"])
            out = attention("flash_attn3", q, k, v)
            cap.append((q, k, v, out))
            return out

        x2 = wan_block(layer_p, x, embed0, ctx, ctx_img, rope_cos, rope_sin,
                       arch, mm_fn, cap_fn, cross_fn)
        (q, k, v, out), = cap
        return x2, q, k, v, out

    l1s, snrs, passed = [], [], []
    for i in range(arch.num_layers):
        layer_p = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        x, q, k, v, dense_out = layer_fwd(layer_p, x)
        l1, s, ok = tune_layer(q, k, v, dense_out, keep_ratio, l1_grid,
                               bar_db, block_q, block_k, head_chunk)
        l1s.append(l1)
        snrs.append(s)
        passed.append(ok)
        if verbose:
            from ..utils.logging_utils import logger

            flag = "" if ok else "  [NO CANDIDATE MET THE BAR — l1=0.0 densest-in-cap fallback]"
            logger.info(f"layer {i:02d}: l1={l1:.3f} snr={s:.1f} dB{flag}")
    return (np.asarray(l1s, np.float32), np.asarray(snrs, np.float32),
            np.asarray(passed, bool))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model_path", help="safetensors checkpoint dir (real weights)")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic gaussian weights (protocol smoke only)")
    ap.add_argument("--structured", action="store_true",
                    help="impose trained-like structure on the synthetic "
                         "weights (channel outliers + shared low-rank q/k "
                         "spikes, weights.structure_params_on_device) so "
                         "block importance is non-flat — the most realistic "
                         "no-checkpoint trajectory available")
    ap.add_argument("--trajectory", type=int, default=0, metavar="N",
                    help="calibrate on N real scheduler steps instead of one "
                         "noise sample: runs the dense UniPC trajectory and "
                         "tunes each layer against the WORST-case SNR over "
                         "latents captured at --capture_fracs of the "
                         "trajectory (the reference tunes offline over real "
                         "denoise trajectories the same way)")
    ap.add_argument("--capture_fracs", default="0.1,0.5,0.9",
                    help="trajectory fractions at which calibration samples "
                         "are captured (with --trajectory)")
    ap.add_argument("--preset", default="1.3b", choices=["tiny", "1.3b", "14b"])
    ap.add_argument("--frames", type=int, default=21, help="latent frames")
    ap.add_argument("--height", type=int, default=60, help="latent height")
    ap.add_argument("--width", type=int, default=104, help="latent width")
    ap.add_argument("--timestep", type=float, default=500.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep_ratio", type=float, default=0.3)
    ap.add_argument("--l1_grid", default=",".join(str(v) for v in DEFAULT_L1_GRID))
    ap.add_argument("--bar_db", type=float, default=30.0)
    ap.add_argument("--block_q", type=int, default=2048)
    ap.add_argument("--block_k", type=int, default=1024)
    ap.add_argument("--eval_head_chunk", type=int, default=0,
                    help="evaluate the SNR grid head_chunk heads at a time "
                         "(must divide num_heads; 0 = whole tensor). The "
                         "capacity knob for native-720P tuning: the "
                         "unchunked eval's f32 temps OOM beside the 14B "
                         "w4a8 weights at S=75600 — use 8")
    ap.add_argument("--platform", help="force a jax platform (e.g. cpu)")
    ap.add_argument("--mm_type", default="Default",
                    help="matmul scheme for the capture stack (the 14b "
                         "preset needs a quantized scheme on one v5e: bf16 "
                         "weights alone are 28 GB; pass the flagship's "
                         "W-int4-group-sym-A-int8-token-dynamic-Tpu and the "
                         "matching --scheme so the synthesized weights "
                         "carry quantized layouts)")
    ap.add_argument("--scheme", default="bf16",
                    help="on-device synthetic weight scheme (bf16/int8/int4)")
    ap.add_argument("--output", default="sparge_tuned.npz")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.preset == "tiny":
        arch = WanArch(dim=256, ffn_dim=512, num_heads=4, num_layers=4,
                       in_dim=16, out_dim=16, text_len=64, text_dim=256)
    else:
        kw = PRESETS["wan2.1_14b" if args.preset == "14b" else "wan2.1_1.3b"]
        arch = WanArch(**kw, in_dim=16, out_dim=16, freq_dim=256,
                       text_len=512, text_dim=4096)

    if args.model_path:
        from ..models.wan.weights import load_wan_from_path

        params = load_wan_from_path(args.model_path, arch)
    elif args.structured and args.scheme not in ("bf16", "Default"):
        # quantized structured synthesis (14b on one 16 GB chip: the bf16
        # master can't be resident — chunked generate->structure->quantize)
        from ..models.wan.weights import init_structured_quantized_params_on_device

        params = init_structured_quantized_params_on_device(
            arch, args.scheme, seed=args.seed, struct_seed=args.seed + 1)
    elif args.synthetic or args.structured:
        from ..models.wan.weights import init_random_params_on_device

        params = init_random_params_on_device(arch, scheme=args.scheme, seed=args.seed)
        if args.structured:
            from ..models.wan.weights import structure_params_on_device

            params = structure_params_on_device(params, seed=args.seed + 1)
    else:
        ap.error("one of --model_path / --synthetic / --structured is required")

    rng = np.random.default_rng(args.seed)
    context = jnp.asarray(
        rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)

    # calibration samples: either one noise latent at --timestep, or
    # (latents, t) captured along a REAL dense denoise trajectory
    samples = []
    if args.trajectory:
        from ..models.wan.pipeline import make_denoise_fn
        from ..schedulers.unipc import WanUniPCScheduler
        from ..utils.config import ConfigDict

        steps = args.trajectory
        sched = WanUniPCScheduler(ConfigDict(infer_steps=steps, sample_shift=5.0))
        target = (arch.in_dim, args.frames, args.height, args.width)
        state = sched.prepare(target, seed=args.seed)
        # flash for the capture trajectory: numerically exact, and the
        # dense-xla path materializes f32[H, S, S] logits — 51 GB at 1.3B
        # full 480P tokens (S=32760), an instant compile-time OOM
        den = make_denoise_fn(arch, sched, target, enable_cfg=False,
                              guide_scale=5.0, mm_type=args.mm_type,
                              self_attn_type="flash_attn3",
                              cross_attn_type="flash_attn3")
        step_fn = jax.jit(den.one_step)
        cap = sorted({min(steps - 1, max(0, int(float(fr) * steps)))
                      for fr in args.capture_fracs.split(",")})
        cache = den.init_cache()
        for i in range(steps):
            if i in cap:
                lat_b, tt = sched.step_pre(state)
                samples.append((jnp.asarray(lat_b)[None],
                                jnp.asarray(tt)[None].astype(jnp.float32)))
            state, cache = step_fn(params, state, cache, context, context,
                                   None, None)
    else:
        latents = jnp.asarray(
            rng.standard_normal((1, arch.in_dim, args.frames, args.height,
                                 args.width)) * 0.5, jnp.bfloat16)
        samples.append((latents, jnp.asarray([args.timestep], jnp.float32)))

    l1_grid = tuple(float(v) for v in args.l1_grid.split(","))
    per_sample = [tune_sparge(params, arch, lat, tt, context,
                              mm_type=args.mm_type,
                              keep_ratio=args.keep_ratio, l1_grid=l1_grid,
                              bar_db=args.bar_db, block_q=args.block_q,
                              block_k=args.block_k,
                              head_chunk=args.eval_head_chunk)
                  for lat, tt in samples]
    # worst case over samples: smallest (most conservative) l1 per layer,
    # lowest SNR, pass only if every sample passed
    l1s = np.min(np.stack([r[0] for r in per_sample]), axis=0)
    snrs = np.min(np.stack([r[1] for r in per_sample]), axis=0)
    passed = np.all(np.stack([r[2] for r in per_sample]), axis=0)

    np.savez(args.output, l1=l1s, snr_db=snrs, passed=passed,
             keep_ratio=np.float32(args.keep_ratio), bar_db=np.float32(args.bar_db))
    print(json.dumps({
        "output": args.output,
        "layers": int(len(l1s)),
        "samples": len(samples),
        "structured": bool(args.structured),
        "l1_mean": float(l1s.mean()),
        "l1_min": float(l1s.min()),
        "l1_max": float(l1s.max()),
        "l1_distinct": int(len(np.unique(l1s))),
        "all_passed": bool(passed.all()),
        "failed_layers": [int(i) for i in np.nonzero(~passed)[0]],
        "snr_min_db": float(snrs.min()),
    }))


if __name__ == "__main__":
    main()
