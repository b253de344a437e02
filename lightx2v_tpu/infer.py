"""CLI offline inference (reference: lightx2v/infer.py:25-74).

    python -m lightx2v_tpu.infer --model_cls wan2.1 --task t2v \
        --model_path /path/to/ckpt --config_json configs/wan_t2v.json \
        --prompt "..." --save_video_path out.mp4

TPU notes: no NCCL init — parallelism comes from ``mesh_shape`` in the
config (single-controller JAX drives every chip in the process).
"""

from __future__ import annotations

import argparse

from .runners import wan_runner  # noqa: F401 — registers runners
from .utils.config import set_config
from .utils.logging_utils import logger
from .utils.media import seed_all
from .utils.registry import RUNNER_REGISTER


def init_runner(config):
    seed_all(int(config.get("seed", 42)))
    runner_cls = RUNNER_REGISTER[config["model_cls"]]
    return runner_cls(config)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="lightx2v_tpu offline inference")
    parser.add_argument("--model_cls", type=str, required=True,
                        choices=["wan2.1", "wan2.1_distill", "wan2.1_causvid",
                                 "wan2.1_skyreels_v2_df", "wan2.1_audio",
                                 "hunyuan", "cogvideox"],
                        help="registered runner key")
    parser.add_argument("--task", type=str, default="t2v", choices=["t2v", "i2v"])
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--config_json", type=str, default=None)
    parser.add_argument("--prompt", type=str, default="")
    parser.add_argument("--negative_prompt", type=str, default="")
    parser.add_argument("--image_path", type=str, default=None)
    parser.add_argument("--audio_path", type=str, default=None)
    parser.add_argument("--save_video_path", type=str, default="./output.mp4")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--use_prompt_enhancer", action="store_true")
    parser.add_argument("--prompt_enhancer_url", type=str, default=None)
    parser.add_argument("--synthetic_weights", action="store_true",
                        help="run with randomly initialized weights (no checkpoint)")
    parser.add_argument("--platform", type=str, default=None, choices=["tpu", "cpu"],
                        help="force a JAX platform (overrides site defaults)")
    parser.add_argument("--compile_cache_dir", type=str, default=None,
                        help="persistent XLA compile cache dir (or env "
                             "LIGHTX2V_COMPILE_CACHE); restarts skip recompiles")
    return parser


def main():
    args = build_parser().parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .utils.envs import setup_compile_cache

    cache = setup_compile_cache(getattr(args, "compile_cache_dir", None))
    if cache:
        logger.info(f"persistent compile cache: {cache}")
    config = set_config(args)
    logger.info(f"config:\n{config}")
    runner = init_runner(config)
    runner.run_pipeline()


if __name__ == "__main__":
    main()
