"""API server entry point (reference: lightx2v/api_server.py).

    python -m lightx2v_tpu.api_server --model_cls wan2.1 --task t2v \
        --model_path ... --config_json ... --port 8000
"""

from __future__ import annotations

import argparse

from .infer import build_parser, init_runner
from .server.api import ApiServer
from .server.service import VideoGenerationService
from .utils.config import set_config
from .utils.logging_utils import logger


def main():
    parser = build_parser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--compile_cache_dir", type=str, default=None,
                        help="persistent XLA compile cache dir (or env "
                             "LIGHTX2V_COMPILE_CACHE)")
    parser.add_argument("--output_root", type=str, default="./outputs",
                        help="directory client save paths are contained under")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .utils.envs import setup_compile_cache

    setup_compile_cache(getattr(args, "compile_cache_dir", None))
    config = set_config(args)

    # num_replicas > 1 = serving data parallelism: one runner per chip,
    # weights replicated, tasks dispatched to free chips concurrently.
    # Incompatible with mesh_shape (model parallelism owns all chips).
    replicas = int(config.get("num_replicas", 1))
    if replicas > 1 and config.get("mesh_shape"):
        logger.warning("num_replicas > 1 ignored: mesh_shape uses all chips for one task")
        replicas = 1
    # each replica gets its own config copy — runners mutate config via
    # set_inputs, and a shared dict would race across worker threads
    import copy

    service = VideoGenerationService(lambda: init_runner(copy.deepcopy(config)),
                                     output_root=args.output_root,
                                     server_config=config, num_replicas=replicas)
    server = ApiServer(service, host=args.host, port=args.port, output_root=args.output_root)
    logger.info(f"serving model_cls={config.get('model_cls')} on {args.host}:{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
