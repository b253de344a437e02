"""GraphRunner: compile-warmup wrapper (reference:
lightx2v/models/runners/graph_runner.py:5-17).

The reference triggers torch.compile by running one step. Here everything
is jitted already; the wrapper runs one tiny denoise step at load time so
the XLA compile cache is hot before the first request (useful for
serving, where the first task otherwise pays the 20-400 s compile)."""

from __future__ import annotations

from ..utils.logging_utils import logger
from ..utils.profiler import ProfilingContext


class GraphRunner:
    def __init__(self, runner):
        self.runner = runner
        self.compile()

    def compile(self):
        logger.info("warmup compile start")
        with ProfilingContext("compile warmup"):
            try:
                encoder_out = self.runner.run_input_encoder()
                self.runner.run_dit(encoder_out)
            except Exception as e:  # pragma: no cover
                logger.warning(f"warmup failed (continuing): {e}")
        logger.info("warmup compile end")

    def __getattr__(self, name):
        return getattr(self.runner, name)

    def run_pipeline(self, save_video: bool = True):
        return self.runner.run_pipeline(save_video=save_video)
