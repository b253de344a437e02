"""Flow-match Euler scheduler.

Used by HunyuanVideo (reference: lightx2v/models/schedulers/hunyuan/
scheduler.py:237-265, ``latents += noise_pred * dt``) and the Wan audio
runner's fixed-timestep variant (wan/audio/scheduler.py:27-150).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.registry import SCHEDULER_REGISTER
from .base import SchedulerBase, State


@SCHEDULER_REGISTER.register(["euler", "flow_match_euler"])
class FlowMatchEulerScheduler(SchedulerBase):
    num_train_timesteps = 1000

    def __init__(self, config, reverse: bool = True):
        super().__init__(config)
        self.sample_shift = float(config.get("sample_shift", 7.0))
        self.reverse = reverse

    def prepare(self, target_shape, seed: int) -> State:
        # Hunyuan builds sigmas = linspace(1, 0, n+1) with time shift
        # sigma' = shift*s / (1 + (shift-1)*s)
        sig = np.linspace(1.0, 0.0, self.infer_steps + 1)
        sig = self.sample_shift * sig / (1 + (self.sample_shift - 1) * sig)
        self.sigmas = sig.astype(np.float32)
        self.timesteps = (sig[:-1] * self.num_train_timesteps).astype(np.float32)
        latents = self.init_latents(target_shape, seed)
        return {"latents": latents, "step_index": jnp.asarray(0, jnp.int32)}

    def step_post(self, state: State, noise_pred: jnp.ndarray) -> State:
        i = state["step_index"]
        sigmas = jnp.asarray(self.sigmas)
        dt = sigmas[i + 1] - sigmas[i]  # negative: integrates toward x0
        latents = state["latents"].astype(jnp.float32) + noise_pred.astype(jnp.float32) * dt
        return {"latents": latents, "step_index": i + 1}
