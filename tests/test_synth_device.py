"""On-device synthetic params generator (weights.init_random_params_on_device):
layouts must match load_wan_params + quantize_model so 14B-scale benches can
run without host->device weight uploads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import wan_forward
from lightx2v_tpu.models.wan.pipeline import rope_for_shape
from lightx2v_tpu.models.wan.weights import (init_random_params_on_device,
                                             init_random_weight_dict, load_wan_params)

ARCH = WanArch(dim=256, ffn_dim=512, num_heads=4, num_layers=2,
               in_dim=16, out_dim=16, text_len=32, text_dim=128)

MM = {
    "bf16": "Default",
    "int8": "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu",
    "fp8": "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Tpu",
    "int4": "W-int4-group-sym-A-bf16-Tpu",
    "fp8_block128": "W-fp8-block128-A-fp8-block128-dynamic-Tpu",
}


def _tree_shapes(t):
    return {jax.tree_util.keystr(k): (v.shape, str(v.dtype))
            for k, v in jax.tree_util.tree_flatten_with_path(t)[0] if v is not None}


@pytest.mark.parametrize("scheme", list(MM))
def test_structure_matches_host_loader(scheme):
    from lightx2v_tpu.tools.convert import quantize_model

    wd = init_random_weight_dict(ARCH, seed=0)
    if scheme != "bf16":
        wd = quantize_model(wd, scheme)
    host = load_wan_params(wd, ARCH)
    dev = init_random_params_on_device(ARCH, scheme=scheme, seed=0)
    hs, ds = _tree_shapes(host), _tree_shapes(dev)
    assert set(hs) == set(ds), f"key mismatch: {set(hs) ^ set(ds)}"
    for k in hs:
        assert hs[k] == ds[k], f"{k}: host {hs[k]} vs device {ds[k]}"


@pytest.mark.parametrize("scheme", ["bf16", "int8", "int4"])
def test_forward_runs_and_is_finite(scheme):
    arch = ARCH
    params = init_random_params_on_device(arch, scheme=scheme, seed=1)
    target = (16, 4, 16, 16)
    cos, sin, seq = rope_for_shape(arch, target)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, *target)) * 0.5, jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.1, jnp.bfloat16)
    out = wan_forward(params, lat, jnp.asarray([500.0], jnp.float32), ctx, cos, sin, arch,
                      mm_type=MM[scheme], self_attn_type="xla", cross_attn_type="xla")
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_i2v_structure():
    arch = WanArch(dim=256, ffn_dim=512, num_heads=4, num_layers=2, in_dim=36,
                   out_dim=16, text_len=32, text_dim=128, task="i2v")
    wd = init_random_weight_dict(arch, seed=0)
    host = load_wan_params(wd, arch)
    dev = init_random_params_on_device(arch, scheme="bf16", seed=0)
    assert set(_tree_shapes(host)) == set(_tree_shapes(dev))


def test_device_randn_like_vae_tree():
    """Generic device-side tree synth: same structure/shapes/dtypes as the
    host VAE loader, strings passed through, stats preserved."""
    from lightx2v_tpu.utils.synth import device_randn_like
    from lightx2v_tpu.vae.wan_vae import (WanVAEConfig, init_random_vae_state_dict,
                                          load_wan_vae_params)

    cfg = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2), num_res_blocks=1)
    host = load_wan_vae_params(init_random_vae_state_dict(cfg, seed=1), cfg, to_jax=False)
    dev = device_randn_like(host, seed=0)

    h_leaves = jax.tree_util.tree_flatten(host, is_leaf=lambda x: isinstance(x, str))[0]
    d_leaves = jax.tree_util.tree_flatten(dev, is_leaf=lambda x: isinstance(x, str))[0]
    assert len(h_leaves) == len(d_leaves)
    for h, d in zip(h_leaves, d_leaves):
        if isinstance(h, str):
            assert h == d
        else:
            assert h.shape == d.shape and str(h.dtype) == str(d.dtype)
    # norm gammas keep their ~1.0 mean so forward passes stay sane
    g_h = np.asarray(host["decoder"]["head_norm"]["g"])
    g_d = np.asarray(dev["decoder"]["head_norm"]["g"], np.float32)
    assert abs(g_d.mean() - g_h.mean()) < 0.5
