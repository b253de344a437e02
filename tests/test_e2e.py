"""End-to-end pipeline smoke tests: CLI args -> config -> runner ->
encoders -> denoise -> VAE decode -> mp4 (synthetic weights).

Mirrors the reference's e2e path (SURVEY.md §3.1) at toy scale.
"""

import os

import numpy as np
import pytest

from lightx2v_tpu.infer import build_parser, init_runner
from lightx2v_tpu.utils.config import set_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")


def make_runner(tmp_path, extra=None):
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a cat surfing a wave",
        "--negative_prompt", "blurry",
        "--save_video_path", str(tmp_path / "out.mp4"),
        "--synthetic_weights",
    ])
    config = set_config(args)
    if extra:
        config.update(extra)
    return init_runner(config), config


def test_t2v_pipeline(tmp_path):
    runner, config = make_runner(tmp_path)
    frames = runner.run_pipeline(save_video=True)
    # 9 frames at 64x96
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()
    assert (tmp_path / "out.mp4").exists()


def test_t2v_distill_pipeline(tmp_path):
    args = build_parser().parse_args([
        "--model_cls", "wan2.1_distill", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a dog in space",
        "--save_video_path", str(tmp_path / "out.mp4"),
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert runner.scheduler.num_steps() == 4


def test_determinism(tmp_path):
    r1, _ = make_runner(tmp_path)
    f1 = r1.run_pipeline(save_video=False)
    r2, _ = make_runner(tmp_path)
    f2 = r2.run_pipeline(save_video=False)
    np.testing.assert_array_equal(f1, f2)


def test_hunyuan_t2v_pipeline(tmp_path):
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "hunyuan_t2v_synthetic_smoke.json")
    args = build_parser().parse_args([
        "--model_cls", "hunyuan", "--task", "t2v",
        "--config_json", cfg_path,
        "--prompt", "a city at night",
        "--save_video_path", str(tmp_path / "hy.mp4"),
        "--synthetic_weights",
    ])
    config = set_config(args)
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_cogvideox_t2v_pipeline(tmp_path):
    args = build_parser().parse_args([
        "--model_cls", "cogvideox", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "fireworks over a lake",
        "--synthetic_weights",
    ])
    config = set_config(args)
    config.update({"enable_cfg": True, "guidance_scale": 6.0,
                   "num_inference_steps": 2, "infer_steps": 2,
                   "self_attn_1_type": "xla", "attention_type": "xla"})
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_changing_resolution_pipeline(tmp_path):
    runner, config = make_runner(tmp_path, extra={
        "changing_resolution": True, "resolution_rate": 0.5,
        "infer_steps": 4, "changing_resolution_steps": 2,
        "target_height": 64, "target_width": 128, "enable_cfg": True,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 128, 3)
    assert np.isfinite(frames).all()


def test_weight_streaming_pipeline(tmp_path):
    runner, config = make_runner(tmp_path, extra={"weight_streaming": True, "enable_cfg": False})
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_mesh_sharded_pipeline(tmp_path):
    """Runner-level multi-chip config: dp=2 (CFG) x sp=2 (tokens) on the
    virtual CPU mesh, with spatially-parallel VAE decode."""
    import jax

    if len(jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs 4 virtual devices")
    runner, config = make_runner(tmp_path, extra={
        "mesh_shape": {"dp": 2, "sp": 2},
        "parallel_vae": True,
        "enable_cfg": True,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_tiling_vae_pipeline(tmp_path):
    runner, config = make_runner(tmp_path, extra={"use_tiling_vae": True, "enable_cfg": False})
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)


def test_radial_attention_pipeline(tmp_path):
    runner, config = make_runner(tmp_path, extra={
        "self_attn_1_type": "radial_attn", "cross_attn_1_type": "xla",
        "enable_cfg": False,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_sparge_attention_pipeline(tmp_path):
    """sparge: true routes video self-attention through meansim block
    sparsity (reference transformer_weights.py:183-190)."""
    runner, config = make_runner(tmp_path, extra={
        "sparge": True, "sparge_keep_ratio": 0.6, "cross_attn_1_type": "xla",
        "enable_cfg": False,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_lazy_disk_tier_pipeline(tmp_path):
    """Disk-tier lazy offload through the full runner: DiT blocks live in
    per-block safetensors files, host buffer capped at 2 blocks, encoders
    synthetic. Output must match the in-HBM synthetic run bit-for-bit
    (same weights, same seed)."""
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict
    from lightx2v_tpu.tools.convert import save_quantized

    # same synthetic arch + seed the runner uses (wan_runner defaults)
    arch = WanArch(dim=384, ffn_dim=768, num_heads=6, num_layers=4,
                   freq_dim=256, text_dim=256)
    wd = init_random_weight_dict(arch, seed=0, scale=0.02)
    ckpt = tmp_path / "blocks_ckpt"
    save_quantized({k: np.asarray(v) for k, v in wd.items()}, str(ckpt), layout="blocks")

    runner, _ = make_runner(tmp_path, extra={"enable_cfg": False})
    ref_frames = runner.run_pipeline(save_video=False)

    lazy_runner, _ = make_runner(tmp_path, extra={
        "enable_cfg": False,
        "lazy_load": True,
        "model_path": str(ckpt),
        "num_disk_workers": 2,
        "max_memory": float(2 * os.path.getsize(ckpt / "block_0.safetensors")) / (1 << 30),
    })
    frames = lazy_runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    np.testing.assert_allclose(frames, ref_frames, rtol=2e-2, atol=2e-2)


def test_shape_bucketing_crops_to_request(tmp_path):
    """shape_bucketing rounds the latent grid up to a bucket (fewer serving
    recompiles) and crops the decoded video back to the request."""
    runner, config = make_runner(tmp_path, extra={
        "shape_bucketing": True,
        # 33 frames -> lat_f 9 -> bucket 12; 56x88 px -> lat 7x11 -> bucket 8x16
        "target_video_length": 33, "target_height": 56, "target_width": 88,
    })
    shape = runner.set_target_shape()
    assert shape == (16, 12, 8, 16)
    assert config["crop_output"] == (33, 56, 88)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (33, 56, 88, 3)
    # bucket-aligned requests compile/crop nothing
    runner2, config2 = make_runner(tmp_path, extra={
        "shape_bucketing": True,
        "target_video_length": 45, "target_height": 64, "target_width": 128,
    })
    assert runner2.set_target_shape() == (16, 12, 8, 16)
    assert not config2.get("crop_output")


def test_lazy_disk_teacache_pipeline(tmp_path):
    """Offload x caching composition through the full runner (VERDICT r2
    #3): disk-tier lazy streaming with TeaCache — skipped steps stream no
    blocks; pipeline completes and reports skip stats."""
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict
    from lightx2v_tpu.tools.convert import save_quantized

    arch = WanArch(dim=384, ffn_dim=768, num_heads=6, num_layers=4,
                   freq_dim=256, text_dim=256)
    wd = init_random_weight_dict(arch, seed=0, scale=0.02)
    ckpt = tmp_path / "blocks_ckpt"
    save_quantized({k: np.asarray(v) for k, v in wd.items()}, str(ckpt), layout="blocks")

    runner, _ = make_runner(tmp_path, extra={
        "enable_cfg": False,
        "lazy_load": True,
        "model_path": str(ckpt),
        "num_disk_workers": 2,
        "feature_caching": "Tea",
        "teacache_thresh": 1e9,  # skip everything after warmup
        "infer_steps": 4,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()
    # 4 steps, 1 warmup calc + cutoff calc; at least one step skipped
    assert runner._tea_stats["skipped"] >= 1


def test_lazy_disk_taylor_and_ada_pipelines(tmp_path):
    """Offload x Taylor-family/Ada caching through the full runner: the
    streamed path now composes with EVERY caching mode (whole-stack
    first-order state for Taylor/Custom, codebook skips for Ada) —
    skipped steps stream no blocks."""
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict
    from lightx2v_tpu.tools.convert import save_quantized

    arch = WanArch(dim=384, ffn_dim=768, num_heads=6, num_layers=4,
                   freq_dim=256, text_dim=256)
    wd = init_random_weight_dict(arch, seed=0, scale=0.02)
    ckpt = tmp_path / "blocks_ckpt"
    save_quantized({k: np.asarray(v) for k, v in wd.items()}, str(ckpt), layout="blocks")

    runner, _ = make_runner(tmp_path, extra={
        "enable_cfg": False, "lazy_load": True, "model_path": str(ckpt),
        "feature_caching": "TaylorSeer", "taylor_cache_dtype": "fp8",
        "infer_steps": 4,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()
    assert runner._taylor_stats["skipped"] == 3  # pattern 4: calc step 0 only

    runner, _ = make_runner(tmp_path, extra={
        "enable_cfg": False, "lazy_load": True, "model_path": str(ckpt),
        "feature_caching": "Ada", "infer_steps": 6,
    })
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()
    assert runner._ada_stats["skipped"] >= 1  # the codebook actually skipped


def test_hunyuan_t2v_pipeline_sp_mesh(tmp_path):
    """Hunyuan runner under mesh_shape: the denoise dispatches to the
    ulysses concat-stream sharded forward (models/hunyuan/sharded.py) and
    matches the unsharded pipeline's frames."""
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "hunyuan_t2v_synthetic_smoke.json")

    def run(mesh):
        args = build_parser().parse_args([
            "--model_cls", "hunyuan", "--task", "t2v",
            "--config_json", cfg_path,
            "--prompt", "a city at night",
            "--synthetic_weights",
        ])
        config = set_config(args)
        if mesh:
            config["mesh_shape"] = mesh
        return init_runner(config).run_pipeline(save_video=False)

    ref = run(None)
    out = run({"sp": 4})
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_cogvideox_t2v_pipeline_sp_mesh(tmp_path):
    """Cog runner under mesh_shape: joint-stream ulysses sharded forward
    (models/cogvideox/sharded.py) matches the unsharded pipeline."""
    def run(mesh):
        args = build_parser().parse_args([
            "--model_cls", "cogvideox", "--task", "t2v",
            "--config_json", CFG,
            "--prompt", "fireworks over a lake",
            "--synthetic_weights",
        ])
        config = set_config(args)
        config.update({"enable_cfg": True, "guidance_scale": 6.0,
                       "infer_steps": 2, "attention_type": "xla"})
        if mesh:
            config["mesh_shape"] = mesh
        return init_runner(config).run_pipeline(save_video=False)

    ref = run(None)
    out = run({"sp": 4})
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)
