"""LCM-style step-distilled scheduler (4-step, CFG-free).

Reference: lightx2v/models/schedulers/wan/step_distill/scheduler.py:8-57.
A fixed ``denoising_step_list`` (e.g. [1000, 750, 500, 250]) indexes the
shifted 1000-point sigma grid; each step predicts x0 from the flow
prediction and re-noises to the next sigma with fresh Gaussian noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import SCHEDULER_REGISTER
from .base import SchedulerBase, State


@SCHEDULER_REGISTER.register(["step_distill", "lcm"])
class WanStepDistillScheduler(SchedulerBase):
    num_train_timesteps = 1000

    def __init__(self, config):
        super().__init__(config)
        self.denoising_step_list = list(config.denoising_step_list)
        self.infer_steps = len(self.denoising_step_list)
        self.sample_shift = float(config.sample_shift)

    def prepare(self, target_shape, seed: int) -> State:
        # sigma grid: linspace(1, 0, N+1)[:-1] with shift warp
        # (reference set_denoising_timesteps :32-40)
        sig = np.linspace(1.0, 0.0, self.num_train_timesteps + 1)[:-1]
        sig = self.sample_shift * sig / (1 + (self.sample_shift - 1) * sig)
        timesteps = sig * self.num_train_timesteps
        idx = [self.num_train_timesteps - x for x in self.denoising_step_list]
        self.timesteps = timesteps[idx].astype(np.float32)
        self.sigmas = sig[idx].astype(np.float32)

        latents = self.init_latents(target_shape, seed)
        return {
            "latents": latents,
            "step_index": jnp.asarray(0, jnp.int32),
            "rng": jax.random.PRNGKey(seed + 1),
        }

    def step_post(self, state: State, noise_pred: jnp.ndarray) -> State:
        i = state["step_index"]
        sigmas = jnp.asarray(self.sigmas)
        flow = noise_pred.astype(jnp.float32)
        x0 = state["latents"].astype(jnp.float32) - sigmas[i] * flow
        rng, sub = jax.random.split(state["rng"])
        noise = jax.random.normal(sub, x0.shape, jnp.float32)
        sigma_next = jnp.where(i < self.infer_steps - 1, sigmas[jnp.minimum(i + 1, self.infer_steps - 1)], 0.0)
        # add_noise: (1 - s) * x0 + s * noise (reference :45-47); at the final
        # step s = 0 so latents = x0
        latents = (1.0 - sigma_next) * x0 + sigma_next * noise
        return {"latents": latents, "step_index": i + 1, "rng": rng}
