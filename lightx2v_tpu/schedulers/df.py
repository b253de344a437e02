"""Diffusion forcing (SkyReels-V2-DF) scheduler.

Reference: lightx2v/models/schedulers/wan/df/skyreels_v2_df_scheduler.py:
``generate_timestep_matrix`` builds a per-frame timestep schedule (rows =
denoise iterations, cols = latent frames) plus update masks and valid
windows; prefix (conditioning) frames get light re-noising
(``addnoise_condition``); each frame is stepped by its own UniPC
sub-scheduler when its mask bit is set.

TPU redesign: the matrix/masks are host-precomputed numpy (pure math);
the per-frame UniPC sub-schedulers become ONE vectorized UniPC whose
scalar schedule math broadcasts over the frame axis, with the update mask
gating state writes — so a whole DF iteration is a single traced step.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import SCHEDULER_REGISTER
from .base import State
from .unipc import WanUniPCScheduler


def generate_timestep_matrix(
    num_frames: int,
    base_num_frames: int,
    step_template: np.ndarray,
    num_pre_ready: int = 0,
    casual_block_size: int = 1,
    ar_step: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, int]]]:
    """Numpy port of the reference matrix construction (:45-130).
    Returns (step_matrix (R, F) timesteps, update_mask (R, F) bool,
    valid_interval list of (start, end) frame windows)."""
    num_iterations = len(step_template) + 1
    nfb = num_frames // casual_block_size
    bfb = base_num_frames // casual_block_size
    if bfb < nfb and ar_step > 0:
        assert ar_step >= int(np.ceil(len(step_template) / bfb))
    tmpl = np.concatenate([[999], np.asarray(step_template, np.int64), [0]])
    pre_row = np.zeros(nfb, np.int64)
    if num_pre_ready > 0:
        pre_row[: num_pre_ready // casual_block_size] = num_iterations

    step_matrix, update_mask, step_index = [], [], []
    while not np.all(pre_row >= num_iterations - 1):
        new_row = np.zeros(nfb, np.int64)
        for i in range(nfb):
            if i == 0 or pre_row[i - 1] >= num_iterations - 1:
                new_row[i] = pre_row[i] + 1
            else:
                new_row[i] = new_row[i - 1] - ar_step
        new_row = np.clip(new_row, 0, num_iterations)
        update_mask.append((new_row != pre_row) & (new_row != num_iterations))
        step_index.append(new_row)
        step_matrix.append(tmpl[new_row])
        pre_row = new_row

    terminal_flag = bfb
    valid_interval = []
    for mask in update_mask:
        if terminal_flag < nfb and mask[terminal_flag]:
            terminal_flag += 1
        valid_interval.append((max(terminal_flag - bfb, 0), terminal_flag))

    sm = np.stack(step_matrix)
    um = np.stack(update_mask)
    if casual_block_size > 1:
        sm = np.repeat(sm, casual_block_size, axis=1)
        um = np.repeat(um, casual_block_size, axis=1)
        valid_interval = [(s * casual_block_size, e * casual_block_size) for s, e in valid_interval]
    return sm, um, valid_interval


@SCHEDULER_REGISTER.register("skyreels_v2_df")
class WanSkyreelsV2DFScheduler(WanUniPCScheduler):
    """Vectorized DF UniPC. The traced step takes the per-frame timestep
    row + mask; sigma/order schedule math follows the base UniPC with the
    per-frame state writes gated by the mask."""

    flag_df = True

    def __init__(self, config):
        super().__init__(config)
        self.addnoise_condition = float(config.get("addnoise_condition", 0))
        self.prefix_len = 0  # latent frames already decided (overlap history)

    def prepare_df(self, target_shape, seed: int, num_pre_ready: int = 0,
                   ar_step: int = 0, casual_block_size: int = 1,
                   base_num_frames: int = None, prefix_latents=None) -> State:
        state = super().prepare(target_shape, seed)
        f = target_shape[1]
        base = base_num_frames or f
        self.step_matrix, self.update_mask, self.valid_interval = generate_timestep_matrix(
            f, base, self.timesteps, num_pre_ready, casual_block_size, ar_step)
        self.prefix_len = num_pre_ready
        self.n_rows = self.step_matrix.shape[0]
        if prefix_latents is not None:
            lat = state["latents"]
            lat = lat.at[:, :num_pre_ready].set(prefix_latents.astype(lat.dtype))
            state["latents"] = lat
        # per-frame UniPC carries: broadcast the scalar carries over frames
        state["m_prev"] = jnp.zeros_like(state["latents"])
        state["m_prev2"] = jnp.zeros_like(state["latents"])
        state["last_sample"] = jnp.zeros_like(state["latents"])
        state["frame_step"] = jnp.zeros((target_shape[1],), jnp.int32)
        state["rng"] = jax.random.PRNGKey(seed + 17)
        return state

    def df_step_pre(self, state: State, row_t: jnp.ndarray):
        """Returns (model latents bf16, per-frame timesteps (F,)) with the
        prefix frames lightly re-noised (reference step_pre :132-150)."""
        lat = state["latents"]
        t = row_t.astype(jnp.float32)
        if self.addnoise_condition > 0 and self.prefix_len > 0:
            nf = 0.001 * self.addnoise_condition
            rng, sub = jax.random.split(state["rng"])
            state = dict(state)
            state["rng"] = rng
            noise = jax.random.normal(sub, lat[:, : self.prefix_len].shape, jnp.float32)
            lat = lat.at[:, : self.prefix_len].set(
                lat[:, : self.prefix_len] * (1.0 - nf) + noise * nf)
            state["latents"] = lat
            t = t.at[: self.prefix_len].set(self.addnoise_condition)
        return state, lat.astype(jnp.bfloat16), t

    def df_step_post(self, state: State, noise_pred: jnp.ndarray,
                     mask_row: jnp.ndarray, global_step: jnp.ndarray) -> State:
        """Vectorized per-frame UniPC update, gated by mask_row (F,)."""
        # run the scalar UniPC step math once (it broadcasts over the frame
        # axis already since latents/m_prev carry it), then select per frame
        sub = {
            "latents": state["latents"],
            "step_index": global_step,
            "m_prev": state["m_prev"],
            "m_prev2": state["m_prev2"],
            "last_sample": state["last_sample"],
        }
        new = super().step_post(sub, noise_pred)
        m = mask_row[None, :, None, None]  # (1, F, 1, 1) over (C, F, H, W)
        out = dict(state)
        for key in ("latents", "m_prev", "m_prev2", "last_sample"):
            out[key] = jnp.where(m, new[key], state[key])
        out["frame_step"] = state["frame_step"] + mask_row.astype(jnp.int32)
        out["step_index"] = global_step + 1
        return out

    def num_steps(self) -> int:
        return self.n_rows
