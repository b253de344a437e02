"""CLIP ViT vision tower tests (tiny arch) + Wan i2v pipeline smoke."""

import os

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightx2v_tpu.encoders.clip import (
    ClipVisionArch,
    clip_vision_forward,
    init_random_clip_state_dict,
    load_clip_vision_params,
    preprocess_image,
)

TINY = ClipVisionArch(image_size=28, patch_size=14, dim=64, mlp_ratio=2,
                      num_heads=4, num_layers=3, use_blocks=2)


def test_forward_shapes_and_patch_conv_equivalence():
    sd = init_random_clip_state_dict(TINY, seed=0, scale=0.05)
    params = load_clip_vision_params(sd, TINY, dtype=np.float32)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    out = clip_vision_forward(params, jnp.asarray(px), TINY)
    assert out.shape == (1, 5, 64)  # cls + 4 patches
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # the reshape-matmul patch embedding must equal torch's conv2d
    w = torch.from_numpy(sd["visual.patch_embedding.weight"])
    ref = F.conv2d(torch.from_numpy(px.transpose(0, 3, 1, 2)), w, stride=14)
    ref = ref.flatten(2).permute(0, 2, 1).numpy()
    x = jnp.asarray(px).reshape(1, 2, 14, 2, 14, 3).transpose(0, 1, 3, 5, 2, 4).reshape(1, 4, 3 * 14 * 14)
    ours = np.asarray(x @ np.asarray(params["patch"]).T)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_preprocess_image():
    img = np.zeros((64, 48, 3), np.float32)  # [-1,1] gray
    out = preprocess_image(img, 28)
    assert out.shape == (1, 28, 28, 3)
    # 0.5 in [0,1] then normalized
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_wan_i2v_pipeline(tmp_path):
    """Full i2v path: image -> CLIP tokens + VAE-encoded conditioning ->
    36-channel DiT input -> video."""
    import cv2

    from lightx2v_tpu.infer import build_parser, init_runner
    from lightx2v_tpu.utils.config import set_config

    img_path = str(tmp_path / "cond.png")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, (64, 96, 3), np.uint8))

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "i2v",
        "--config_json", cfg,
        "--prompt", "the image comes alive",
        "--image_path", img_path,
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_quantized_clip_matches_dense():
    """int8-quantized vision-tower linears (reference q_linear.py) vs dense."""
    import jax.numpy as jnp

    from lightx2v_tpu.encoders.clip import (
        ClipVisionArch, clip_vision_forward, init_random_clip_state_dict,
        load_clip_vision_params, quantize_clip_params,
    )

    arch = ClipVisionArch(image_size=28, patch_size=14, dim=64, num_heads=4,
                          num_layers=2, use_blocks=2)
    sd = init_random_clip_state_dict(arch, seed=0, scale=0.1)
    params = load_clip_vision_params(sd, arch, dtype=np.float32)
    qparams = quantize_clip_params(params, "int8")
    px = jnp.asarray(np.random.default_rng(1).standard_normal((1, 28, 28, 3)), jnp.float32)
    ref = np.asarray(clip_vision_forward(params, px, arch), np.float32)
    out = np.asarray(clip_vision_forward(qparams, px, arch), np.float32)
    snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
    assert snr < 1e-2, f"snr {snr}"
