"""CogVideoX XDPM scheduler (reference: lightx2v/models/schedulers/
cogvideox/scheduler.py): scaled-linear betas, SNR shift, zero-terminal-SNR
rescale, trailing timestep spacing, v-prediction, DPM-solver++(2M)-SDE-style
update with second-order correction from the previous x0 prediction.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import SCHEDULER_REGISTER
from .base import SchedulerBase, State


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """arXiv:2305.08891 Algorithm 1 (on alphas_cumprod as the reference does)."""
    s = np.sqrt(alphas_cumprod)
    s0, sT = s[0].copy(), s[-1].copy()
    s = (s - sT) * (s0 / (s0 - sT))
    return s**2


@SCHEDULER_REGISTER.register("cogvideox_xdpm")
class CogvideoxXDPMScheduler(SchedulerBase):
    num_train_timesteps = 1000

    def __init__(self, config):
        config.setdefault("infer_steps", config.get("num_inference_steps", 50))
        super().__init__(config)
        c = config
        beta_start = float(c.get("scheduler_beta_start", 0.00085))
        beta_end = float(c.get("scheduler_beta_end", 0.012))
        snr_shift = float(c.get("scheduler_snr_shift_scale", 1.0))
        if c.get("scheduler_beta_schedule", "scaled_linear") == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5, self.num_train_timesteps, dtype=np.float64) ** 2
        else:
            betas = np.linspace(beta_start, beta_end, self.num_train_timesteps, dtype=np.float64)
        ac = np.cumprod(1.0 - betas)
        ac = ac / (snr_shift + (1 - snr_shift) * ac)
        if c.get("scheduler_rescale_betas_zero_snr", True):
            ac = rescale_zero_terminal_snr(ac)
        self.alphas_cumprod = ac.astype(np.float64)
        self.final_alpha_cumprod = 1.0 if c.get("scheduler_set_alpha_to_one", True) else float(ac[0])
        self.prediction_type = c.get("scheduler_prediction_type", "v_prediction")

        spacing = c.get("timestep_spacing", "trailing")
        n = self.infer_steps
        if spacing == "linspace":
            ts = np.linspace(0, self.num_train_timesteps - 1, n).round()[::-1].astype(np.int64)
        elif spacing == "leading":
            ratio = self.num_train_timesteps // n
            ts = (np.arange(n) * ratio).round()[::-1].astype(np.int64) + int(c.get("steps_offset", 0))
        else:  # trailing
            ratio = self.num_train_timesteps / n
            ts = np.round(np.arange(self.num_train_timesteps, 0, -ratio)).astype(np.int64) - 1
        self.timesteps = ts.astype(np.float32)
        self._ts_int = ts

    def prepare(self, target_shape, seed: int) -> State:
        latents = self.init_latents(target_shape, seed)
        return {
            "latents": latents,
            "step_index": jnp.asarray(0, jnp.int32),
            "old_pred_x0": jnp.zeros_like(latents),
            "has_old": jnp.asarray(False),
            "rng": jax.random.PRNGKey(seed + 3),
        }

    def step_post(self, state: State, noise_pred: jnp.ndarray, noise=None) -> State:
        """``noise`` overrides the carried-PRNG sample (equivalence tests
        inject the reference's torch generator stream)."""
        i = state["step_index"]
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)
        ts = jnp.asarray(self._ts_int, jnp.int32)
        t = ts[i]
        prev_t = t - self.num_train_timesteps // self.infer_steps
        a_t = ac[t]
        a_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], jnp.float32(self.final_alpha_cumprod))
        t_back = ts[jnp.maximum(i - 1, 0)]
        a_back = ac[t_back]
        b_t = 1.0 - a_t

        sample = state["latents"].astype(jnp.float32)
        pred = noise_pred.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(b_t) * pred) / jnp.sqrt(a_t)
        elif self.prediction_type == "sample":
            x0 = pred
        else:  # v_prediction
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * pred

        lamb = jnp.log(jnp.sqrt(a_t / (1 - a_t)))
        lamb_next = jnp.log(jnp.sqrt(a_prev / (1 - a_prev)))
        h = lamb_next - lamb
        lamb_prev = jnp.log(jnp.sqrt(a_back / (1 - a_back)))
        r = jnp.where(i > 0, (lamb - lamb_prev) / h, 1.0)

        mult1 = jnp.sqrt((1 - a_prev) / (1 - a_t)) * jnp.exp(-h)
        mult2 = jnp.expm1(-2 * h) * jnp.sqrt(a_prev)
        mult3 = 1 + 1 / (2 * r)
        mult4 = 1 / (2 * r)
        mult_noise = jnp.sqrt(1 - a_prev) * jnp.sqrt(1 - jnp.exp(-2 * h))

        rng, k1 = jax.random.split(state["rng"])
        if noise is None:
            noise = jax.random.normal(k1, sample.shape, jnp.float32)
        else:
            noise = noise.astype(jnp.float32)
        first_order = mult1 * sample - mult2 * x0 + mult_noise * noise
        denoised_d = mult3 * x0 - mult4 * state["old_pred_x0"]
        second_order = mult1 * sample - mult2 * denoised_d + mult_noise * noise
        use_first = (~state["has_old"]) | (prev_t < 0)
        latents = jnp.where(use_first, first_order, second_order)
        return {
            "latents": latents,
            "step_index": i + 1,
            "old_pred_x0": x0,
            "has_old": jnp.asarray(True),
            "rng": rng,
        }
