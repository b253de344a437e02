"""Scheduler protocol, TPU-style.

The reference drives the denoise loop imperatively: ``step_pre`` mutates
``scheduler.latents``/``step_index``, the model writes
``scheduler.noise_pred``, ``step_post`` updates latents (reference:
lightx2v/models/schedulers/scheduler.py:5-21, runners/default_runner.py:97-114).

Here a scheduler is split into
  * host-side schedule precompute (``prepare``): sigmas/timesteps as numpy,
    seeded latent init;
  * a pure, jittable ``step_post(state, noise_pred) -> state`` suitable as a
    ``lax.scan`` body, with all step bookkeeping inside the ``state`` pytree.

``state`` is a plain dict of arrays so it is a pytree; ``step_index`` is a
traced scalar inside it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

State = Dict[str, Any]


class SchedulerBase:
    """Shared interface; concrete schedulers fill in the math."""

    flag_df = False  # diffusion-forcing (2D timesteps) — SkyReels DF sets True

    def __init__(self, config):
        self.config = config
        self.infer_steps = int(config.infer_steps)
        # caching_records: per-step compute/skip pattern used by feature
        # caching (True = run the transformer) — reference scheduler.py:11
        self.caching_records = [True] * self.infer_steps
        self.caching_records_2 = [True] * self.infer_steps
        self.timesteps: Optional[np.ndarray] = None  # (steps,) f32
        self.sigmas: Optional[np.ndarray] = None  # (steps+1,) f32

    # ---------------- host-side ----------------
    def prepare(self, target_shape, seed: int) -> State:
        """Compute schedule tables and return the initial state pytree."""
        raise NotImplementedError

    def init_latents(self, target_shape, seed: int) -> jnp.ndarray:
        """Seeded initial noise. ``latent_init: "torch"`` reproduces the
        reference's CPU torch.Generator stream bit-exactly (reference
        wan/scheduler.py:25-27,55-63 uses torch.randn(generator)), so runs
        can be compared frame-to-frame against the reference; the default
        stays jax.random (faster, device-side)."""
        if str(self.config.get("latent_init", "jax")) == "torch":
            import torch

            g = torch.Generator(device="cpu").manual_seed(int(seed))
            lat = torch.randn(tuple(int(s) for s in target_shape), generator=g, dtype=torch.float32)
            return jnp.asarray(lat.numpy())
        key = jax.random.PRNGKey(seed)
        return jax.random.normal(key, tuple(target_shape), dtype=jnp.float32)

    # ---------------- traced ----------------
    def step_pre(self, state: State) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return (model_input_latents[bf16], timestep scalar) for this step."""
        t = jnp.asarray(self.timesteps)[state["step_index"]]
        return state["latents"].astype(jnp.bfloat16), t

    def step_post(self, state: State, noise_pred: jnp.ndarray) -> State:
        raise NotImplementedError

    # number of denoising iterations (scan length)
    def num_steps(self) -> int:
        return self.infer_steps
