"""Fused-RoPE path tests: half-split weight permutation preserves the
forward exactly; the in-kernel rotation matches apply_rope_half + flash."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import wan_forward
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params, permute_qk_half
from lightx2v_tpu.ops.pallas.flash_attention import flash_attention, flash_attention_fused_rope
from lightx2v_tpu.ops.rope import apply_rope, apply_rope_half, build_wan_rope_grid


def test_half_rope_matches_interleaved_after_permute():
    """apply_rope_half(perm(x)) == perm(apply_rope(x)) per head."""
    rng = np.random.default_rng(0)
    b, s, n, hd = 1, 6, 2, 8
    x = jnp.asarray(rng.standard_normal((b, s, n, hd)), jnp.float32)
    cos, sin = build_wan_rope_grid(hd, 2, 1, 3)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    perm = np.arange(hd).reshape(hd // 2, 2).T.reshape(-1)
    ref = np.asarray(apply_rope(x, cos, sin))[..., perm]
    out = np.asarray(apply_rope_half(x[..., perm], cos, sin))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_permuted_forward_matches_baseline():
    """rope_fused arch + permuted weights == baseline forward (scores are
    invariant under the shared q/k feature permutation)."""
    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    arch_f = dataclasses.replace(arch, rope_fused=True)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    params_f = permute_qk_half(params, arch)

    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    f, h, w = 2, 2, 4
    cos, sin = build_wan_rope_grid(arch.head_dim, f, h, w)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, ctx, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")
    out = wan_forward(params_f, latents, t, ctx, cos, sin, arch_f,
                      self_attn_type="xla", cross_attn_type="xla")
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    c = np.corrcoef(np.asarray(out, np.float32).ravel(), np.asarray(ref, np.float32).ravel())[0, 1]
    assert c > 0.9999


def test_fused_kernel_matches_half_rope_plus_flash():
    rng = np.random.default_rng(2)
    b, s, n, hd = 1, 256 + 37, 2, 64  # non-multiple length, rope shorter than s
    q, k, v = [jnp.asarray(rng.standard_normal((b, s, n, hd)) * 0.5, jnp.float32) for _ in range(3)]
    cos, sin = build_wan_rope_grid(hd, 4, 4, 16)  # 256 rope tokens < s
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    qr = apply_rope_half(q, cos, sin)
    kr = apply_rope_half(k, cos, sin)
    ref = flash_attention(qr.astype(jnp.bfloat16), kr.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16), interpret=True)
    out = flash_attention_fused_rope(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                     v.astype(jnp.bfloat16), cos, sin, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
    c = np.corrcoef(np.asarray(out, np.float32).ravel(), np.asarray(ref, np.float32).ravel())[0, 1]
    assert c > 0.999


def test_rope_fused_pipeline_e2e(tmp_path):
    import os

    from lightx2v_tpu.infer import build_parser, init_runner
    from lightx2v_tpu.utils.config import set_config

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", cfg_path, "--synthetic_weights",
    ])
    config = set_config(args)
    config["rope_fused"] = True
    config["enable_cfg"] = False
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()

    # and the fused path must agree with the baseline pipeline
    config2 = set_config(args)
    config2["enable_cfg"] = False
    runner2 = init_runner(config2)
    ref = runner2.run_pipeline(save_video=False)
    c = np.corrcoef(frames.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, f"corr {c}"
