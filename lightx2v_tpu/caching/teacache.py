"""TeaCache: timestep-embedding-aware whole-stack skipping.

Reference semantics (lightx2v/models/networks/wan/infer/feature_caching/
transformer_infer.py:9-171): accumulate a polynomial-rescaled relative-L1
distance between consecutive timestep embeddings; when the accumulator
stays under ``teacache_thresh`` the whole 30/40-block transformer is
skipped and the cached residual is re-applied (``x += previous_residual``).
Warm-up (``ret_steps``) and tail (``cutoff_steps``) always compute.

TPU redesign: the decision is a traced scalar driving ``lax.cond`` inside
the jitted denoise scan — no host round-trip per step. With batched CFG
(cond/uncond in one pass) the two sides share one decision: compute if
EITHER side's accumulator crosses the threshold. This is strictly more
conservative than the reference's per-side decisions (never skips when
the reference would compute), with per-side accumulators kept exactly as
in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TeaCacheConfig:
    thresh: float = 0.26
    coefficients: Tuple[float, ...] = (2.39676752e03, -1.31110545e03, 2.01331979e02, -8.29855975e00, 1.37887774e-01)
    use_ret_steps: bool = False
    ret_steps: int = 1      # in denoise steps (reference counts forwards: 1*2 or 5*2)
    cutoff_steps: int = 10**9

    @staticmethod
    def from_config(config) -> "TeaCacheConfig":
        use_ret = bool(config.get("use_ret_steps", False))
        coeffs = config.get("coefficients")
        if coeffs:
            c = tuple(coeffs[0] if use_ret else coeffs[1])
        else:
            c = TeaCacheConfig.coefficients
        steps = int(config.infer_steps)
        # reference counts individual forward passes (x2 for CFG); our step
        # granularity is one denoise step
        ret = 5 if use_ret else 1
        cutoff = steps if use_ret else steps - 1
        return TeaCacheConfig(
            thresh=float(config.get("teacache_thresh", 0.26)),
            coefficients=c,
            use_ret_steps=use_ret,
            ret_steps=ret,
            cutoff_steps=cutoff,
        )


def init_tea_state(x_shape, modulated_shape, dtype=jnp.bfloat16) -> Dict:
    b = modulated_shape[0]
    return {
        "prev_mod": jnp.zeros(modulated_shape, jnp.float32),
        "prev_residual": jnp.zeros(x_shape, dtype),
        "accum": jnp.zeros((b,), jnp.float32),
    }


def tea_decide(state: Dict, embed: jnp.ndarray, embed0: jnp.ndarray,
               step_index: jnp.ndarray, cfg: TeaCacheConfig):
    """-> (should_calc (bool scalar), new_state). Mirrors
    calculate_should_calc (reference :31-81)."""
    modulated = (embed0 if cfg.use_ret_steps else embed).astype(jnp.float32)
    flat = modulated.reshape(modulated.shape[0], -1)
    prev = state["prev_mod"].reshape(flat.shape)
    rel = jnp.mean(jnp.abs(flat - prev), axis=1) / jnp.maximum(jnp.mean(jnp.abs(prev), axis=1), 1e-8)
    rescaled = jnp.polyval(jnp.asarray(cfg.coefficients, jnp.float32), rel)
    accum = state["accum"] + rescaled

    warmup = (step_index < cfg.ret_steps) | (step_index >= cfg.cutoff_steps)
    over = jnp.any(accum >= cfg.thresh)
    should_calc = warmup | over
    accum = jnp.where(should_calc, jnp.zeros_like(accum), accum)

    new_state = dict(state)
    new_state["prev_mod"] = modulated
    new_state["accum"] = accum
    return should_calc, new_state


def tea_decision_series(mod_series, cfg: TeaCacheConfig):
    """Host-exact replay of ``tea_decide`` over a whole run.

    The Tea decision depends ONLY on the timestep-embedding series (never
    on latents), so the full calc/skip schedule is known before the first
    denoise step: ``mod_series`` is the per-step modulated input —
    ``embed`` (or ``embed0`` when ``use_ret_steps``) stacked to
    (S, ...) — fetched from one tiny jitted ``time_embeddings`` call.
    Returns a host bool array (S,) of should_calc decisions, identical to
    what the traced tea_decide would produce step by step (shared across
    CFG sides, as tea_decide's ``any``). Used by host-stepped drivers to
    pick the trace-time branch (pipeline.one_step_calc/_skip)."""
    import numpy as np

    mods = np.asarray(mod_series, np.float32)
    S = len(mods)
    # per-row accumulators, exactly as tea_decide: (S, B, -1) with a (B,)
    # accum and decision = any(row accum >= thresh). With identical CFG
    # rows this reduces to the old scalar replay; with differing rows
    # (e.g. per-side cfg embeds) it no longer silently diverges.
    # (S, D) = batchless per-step embed; (S, B, ...) = stacked CFG rows
    mods = mods.reshape(S, mods.shape[1], -1) if mods.ndim >= 3 else mods.reshape(S, 1, -1)
    coeffs = np.asarray(cfg.coefficients, np.float32)
    prev = np.zeros_like(mods[0])
    accum = np.zeros(mods.shape[1], np.float32)
    out = np.zeros(S, bool)
    for i in range(S):
        rel = np.abs(mods[i] - prev).mean(axis=1) / np.maximum(np.abs(prev).mean(axis=1), 1e-8)
        accum = accum + np.polyval(coeffs, rel).astype(np.float32)
        should = (i < cfg.ret_steps) or (i >= cfg.cutoff_steps) or bool(np.any(accum >= cfg.thresh))
        if should:
            accum[:] = 0.0
        out[i] = should
        prev = mods[i]
    return out


def tea_decide_per_side(state: Dict, embed: jnp.ndarray, embed0: jnp.ndarray,
                        step_index: jnp.ndarray, cfg: TeaCacheConfig):
    """Per-batch-row decisions (the reference's per-side cond/uncond
    skipping, feature_caching/transformer_infer.py:14-19 — separate
    caching_records / accumulators per CFG side).
    -> (should_vec (B,) bool, new_state)."""
    modulated = (embed0 if cfg.use_ret_steps else embed).astype(jnp.float32)
    flat = modulated.reshape(modulated.shape[0], -1)
    prev = state["prev_mod"].reshape(flat.shape)
    rel = jnp.mean(jnp.abs(flat - prev), axis=1) / jnp.maximum(jnp.mean(jnp.abs(prev), axis=1), 1e-8)
    rescaled = jnp.polyval(jnp.asarray(cfg.coefficients, jnp.float32), rel)
    accum = state["accum"] + rescaled

    warmup = (step_index < cfg.ret_steps) | (step_index >= cfg.cutoff_steps)
    should_vec = warmup | (accum >= cfg.thresh)  # (B,)
    accum = jnp.where(should_vec, jnp.zeros_like(accum), accum)

    new_state = dict(state)
    new_state["prev_mod"] = modulated
    new_state["accum"] = accum
    return should_vec, new_state


def tea_transform_per_side(state: Dict, should_vec: jnp.ndarray, x: jnp.ndarray,
                           transformer_fn, transformer_fn_single=None):
    """Per-side run-or-skip for the batched CFG pair x = [cond, uncond].

    Four traced branches (lax.switch): both compute (one B=2 forward, full
    MXU batch), exactly one computes (B=1 forward for that side, cached
    residual for the other), neither (both residuals). Matches the
    reference's per-side skipping while keeping the batched-CFG layout.
    ``transformer_fn_single(x_one, side)`` runs a B=1 forward with that
    side's conditioning (side is a static python int per traced branch);
    defaults to ``lambda x, side: transformer_fn(x)``."""
    single = transformer_fn_single or (lambda x_one, side: transformer_fn(x_one))

    def _apply_residual(x_in, st):
        return x_in + st["prev_residual"].astype(x_in.dtype)

    def neither(op):
        x_in, st = op
        return _apply_residual(x_in, st), dict(st)

    def _one_side(op, side):
        x_in, st = op
        xi = x_in[side:side + 1]
        xo = single(xi, side)
        skipped = 1 - side
        xs = x_in[skipped:skipped + 1] + st["prev_residual"][skipped:skipped + 1].astype(x_in.dtype)
        out = jnp.concatenate([xo, xs] if side == 0 else [xs, xo], axis=0)
        st = dict(st)
        st["prev_residual"] = st["prev_residual"].at[side].set(
            (xo[0] - xi[0]).astype(st["prev_residual"].dtype))
        return out, st

    def only_uncond(op):
        return _one_side(op, 1)

    def only_cond(op):
        return _one_side(op, 0)

    def both(op):
        x_in, st = op
        x_out = transformer_fn(x_in)
        st = dict(st)
        st["prev_residual"] = (x_out - x_in).astype(st["prev_residual"].dtype)
        return x_out, st

    idx = should_vec[0].astype(jnp.int32) * 2 + should_vec[1].astype(jnp.int32)
    return jax.lax.switch(idx, [neither, only_uncond, only_cond, both], (x, state))


def tea_transform(state: Dict, should_calc: jnp.ndarray, x: jnp.ndarray, transformer_fn,
                  branch=None):
    """Run or skip the block stack (reference infer :84-154):
    compute -> residual cached; skip -> x + cached residual.

    ``branch``: None traces both paths under ``lax.cond`` (the
    scan-compatible default). True/False selects the compute/skip path at
    TRACE time — the Tea decision depends only on the timestep-embedding
    series (host-replayable exactly, ``tea_decision_series``), so a
    host-stepped driver can compile two roughly half-sized programs
    instead of one dual-branch program (which RESOURCE_EXHAUSTs at 14B
    720P token counts where the plain forward fits)."""

    def compute(operand):
        x_in, st = operand
        x_out = transformer_fn(x_in)
        st = dict(st)
        res = x_out - x_in
        if st["prev_residual"].dtype == jnp.float8_e4m3fn:
            # e4m3 saturates at 448; clip like taylorseer's store() so an
            # outlier residual never becomes inf/nan in the cache
            res = jnp.clip(res.astype(jnp.float32), -448.0, 448.0)
        st["prev_residual"] = res.astype(st["prev_residual"].dtype)
        return x_out, st

    def skip(operand):
        x_in, st = operand
        return x_in + st["prev_residual"].astype(x_in.dtype), dict(st)

    if branch is not None:
        return (compute if branch else skip)((x, state))
    return jax.lax.cond(should_calc, compute, skip, (x, state))
