"""Runner abstractions (reference: lightx2v/models/runners/base_runner.py:32-165
and default_runner.py).

A runner owns the pieces of one model family's pipeline: text/image
encoders, DiT denoiser, VAE, scheduler — and drives
``run_pipeline``: encode inputs -> denoise -> VAE decode -> save video.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from ..utils.logging_utils import logger
from ..utils.media import cache_video, seed_all
from ..utils.profiler import ProfilingContext


class TaskStopped(Exception):
    """A task-stop request interrupted the pipeline between stages."""


class BaseRunner:
    def __init__(self, config):
        self.config = config
        self.progress_callback = None
        self.stop_event = None  # per-task threading.Event set by the service
        self.inputs: Dict[str, Any] = {}

    # -- component loading (overridden per model family) --
    def load_transformer(self):
        raise NotImplementedError

    def load_text_encoder(self):
        raise NotImplementedError

    def load_image_encoder(self):
        return None

    def load_vae(self):
        raise NotImplementedError

    def init_scheduler(self):
        raise NotImplementedError

    def set_target_shape(self):
        raise NotImplementedError

    def set_progress_callback(self, cb):
        self.progress_callback = cb

    def set_inputs(self, inputs: Dict[str, Any]):
        """Accept a task dict (prompt, negative_prompt, image_path, seed...)
        — the server feeds tasks through here (reference default_runner)."""
        req_mm = inputs.pop("mm_type", None)
        loaded = getattr(self, "mm_type", None)
        if req_mm and loaded is None:
            # runners without a quantized-GEMM notion (or pre-load) can't
            # honor a per-task mm_type; say so instead of dropping it
            logger.warning(
                f"task requested mm_type {req_mm!r} but this runner has no "
                "mm_type (request ignored; quantization is a load-time "
                "property of the server config)")
        if req_mm and loaded and req_mm != loaded:
            # quantization is a LOAD-time property (weights are quantized
            # when the runner starts); silently accepting a different
            # mm_type per task would generate under the wrong scheme
            raise ValueError(
                f"task requested mm_type {req_mm!r} but the server loaded "
                f"{loaded!r}; relaunch with that mm_config/quantized ckpt "
                "(per-task quantization switching is not supported)")
        self.config.update({k: v for k, v in inputs.items() if v is not None})


class DefaultRunner(BaseRunner):
    """Generic pipeline driver (reference default_runner.py:202-221)."""

    def __init__(self, config):
        super().__init__(config)
        seed_all(int(config.get("seed", 42)))
        self.init_modules()

    @ProfilingContext("Load models")
    def init_modules(self):
        self.model = self.load_transformer()
        self.text_encoder = self.load_text_encoder()
        self.image_encoder = self.load_image_encoder()
        self.vae = self.load_vae()

    def _mesh_devices(self):
        """Device list for this runner's mesh. ``config["mesh_devices"]``
        (a list of device indices) carves a SUB-mesh out of the machine —
        set by the serving layer when dp replicas each own an sp/tp group
        of chips (server/service.py) — otherwise all devices."""
        import jax

        ids = self.config.get("mesh_devices")
        if not ids:
            return None
        devs = jax.devices()
        return [devs[int(i)] for i in ids]

    def run_input_encoder(self) -> Dict[str, Any]:
        raise NotImplementedError

    def run_dit(self, encoder_out: Dict[str, Any]):
        raise NotImplementedError

    def run_vae_decoder(self, latents) -> np.ndarray:
        raise NotImplementedError

    def save_video(self, frames: np.ndarray, save_path: str):
        cache_video(frames, save_path, fps=int(self.config.get("fps", 16)))
        logger.info(f"saved video to {save_path}")

    def check_stop(self):
        """Raise TaskStopped when this runner's task was asked to stop.
        Called between pipeline stages (the denoise scan itself is one
        compiled program; stop granularity is the stage boundary)."""
        ev = getattr(self, "stop_event", None)
        if ev is not None and ev.is_set():
            raise TaskStopped("task stop requested")

    def run_pipeline(self, save_video: bool = True) -> Optional[np.ndarray]:
        with ProfilingContext("Run Encoders"):
            encoder_out = self.run_input_encoder()
        self.check_stop()
        with ProfilingContext("Run DiT"):
            latents = self.run_dit(encoder_out)
        self.check_stop()
        with ProfilingContext("Run VAE Decoder"):
            frames = self.run_vae_decoder(latents)
        if save_video:
            save_path = self.config.get("save_video_path", "./output.mp4")
            with ProfilingContext("Save video"):
                self.save_video(frames, save_path)
        return frames
