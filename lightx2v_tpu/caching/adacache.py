"""AdaCache: adaptive whole-stack skipping with a rate codebook.

Reference (lightx2v/models/networks/wan/infer/feature_caching/
transformer_infer.py:309-519): on compute steps the decisive middle
block's gated self-attn output is recorded; the L1-norm ratio between
consecutive recordings (plus a motion regularizer "moreg" over temporal
token strides) indexes a codebook {0.03:12, 0.05:10, 0.07:8, 0.09:6,
0.11:4, 1.0:3} giving how many steps to skip; skipped steps replay the
cached whole-stack residual.

TPU structure: all state (residuals, tiny residuals, moreg scalars,
skip-until counter) lives in the denoise scan carry; the step picks
compute/skip with ``lax.cond`` on the counter.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CODEBOOK_THRESH = (0.03, 0.05, 0.07, 0.09, 0.11)
CODEBOOK_RATES = (12.0, 10.0, 8.0, 6.0, 4.0, 3.0)
MOREG_HYP = (0.385, 8.0, 1.0)
MOGRAD_MUL = 10.0


def init_ada_state(x_shape, dtype=jnp.bfloat16, metric_scale: float = 1.0) -> Dict:
    return {
        "prev_residual": jnp.zeros(x_shape, dtype),
        "prev_tiny": jnp.zeros(x_shape, jnp.float32),
        "has_tiny": jnp.asarray(False),
        "prev_moreg": jnp.asarray(1.0, jnp.float32),
        "skipped_len": jnp.asarray(1.0, jnp.float32),
        "skip_until": jnp.asarray(0, jnp.int32),
        "calc_count": jnp.asarray(0, jnp.int32),  # observability/calibration
        # carried (traced) so calibration probes re-run one compiled
        # program with different scales instead of recompiling
        "metric_scale": jnp.asarray(metric_scale, jnp.float32),
    }


def ada_skip_length(state: Dict, now_tiny: jnp.ndarray, step_index, n_steps: int,
                    tokens_per_frame: int) -> Tuple[jnp.ndarray, Dict]:
    """reference calculate_skip_step_length (:389-433). now_tiny: (B,S,D).

    ``state["metric_scale"]`` calibrates the decision metric's operating
    point: the codebook thresholds were fit on trained-checkpoint feature
    dynamics; on synthetic benchmark weights the raw metric collapses to
    the longest skips, so the bench bisects a scale that reproduces the
    reference's published calc fraction before timing
    (scripts/bench/bench_caching.py, mirroring the TeaCache threshold
    calibration)."""
    res = now_tiny.astype(jnp.float32)
    cache = state["prev_tiny"]
    l1 = lambda t: jnp.sum(jnp.abs(t))
    cache_diff = l1(cache - res) / jnp.maximum(l1(cache), 1e-8)
    cache_diff = cache_diff / state["skipped_len"]

    # motion regularizer over 1-frame token strides (moreg_strides=[1])
    sd = tokens_per_frame
    a, b = res[:, sd:], res[:, :-sd]
    moreg_raw = l1(a - b) / jnp.maximum(l1(a) + l1(b), 1e-8)
    moreg_on = (step_index >= int(0.1 * n_steps)) & (step_index <= int(0.9 * n_steps))
    moreg = jnp.where(moreg_on, ((moreg_raw / MOREG_HYP[0]) ** MOREG_HYP[1]) / MOREG_HYP[2], 1.0)
    mograd = MOGRAD_MUL * (moreg - state["prev_moreg"]) / state["skipped_len"]
    metric = cache_diff * (moreg + jnp.abs(mograd)) * state["metric_scale"]

    rate = jnp.asarray(CODEBOOK_RATES[-1], jnp.float32)
    for t, r in zip(reversed(CODEBOOK_THRESH), reversed(CODEBOOK_RATES[:-1])):
        rate = jnp.where(metric < t, jnp.asarray(r, jnp.float32), rate)
    # first recording: rate 1 (reference :391-393)
    rate = jnp.where(state["has_tiny"], rate, 1.0)

    new = dict(state)
    new["prev_tiny"] = res
    new["has_tiny"] = jnp.asarray(True)
    new["prev_moreg"] = jnp.where(moreg_on, moreg, state["prev_moreg"])
    new["skipped_len"] = rate
    new["skip_until"] = (step_index + rate.astype(jnp.int32)).astype(jnp.int32)
    return rate, new
