import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.pipeline import make_denoise_fn, rope_for_shape
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.parallel.mesh import build_mesh
from lightx2v_tpu.schedulers.step_distill import WanStepDistillScheduler
from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
from lightx2v_tpu.utils.config import ConfigDict

ARCH = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
               freq_dim=32, text_len=8, text_dim=16)
TARGET = (4, 2, 4, 8)  # (C, F, H, W) -> 16 tokens


def _ctx(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)


@pytest.fixture(scope="module")
def params():
    return load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)


def test_unipc_full_loop(params):
    cfg = ConfigDict({"infer_steps": 4, "sample_shift": 5.0})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=42)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=5.0,
                              self_attn_type="xla", cross_attn_type="xla")
    out = denoise(params, state, _ctx(0), _ctx(1))
    lat = np.asarray(out["latents"])
    assert lat.shape == TARGET
    assert np.isfinite(lat).all()
    assert out["step_index"] == 4


def test_distill_loop_no_cfg(params):
    cfg = ConfigDict({"infer_steps": 4, "sample_shift": 5.0,
                      "denoising_step_list": [1000, 750, 500, 250]})
    sched = WanStepDistillScheduler(cfg)
    state = sched.prepare(TARGET, seed=42)
    denoise = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=False,
                              self_attn_type="xla", cross_attn_type="xla")
    out = denoise(params, state, _ctx(0), _ctx(0))
    assert np.isfinite(np.asarray(out["latents"])).all()


def test_sharded_loop_matches_single(params):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ConfigDict({"infer_steps": 2, "sample_shift": 5.0})
    sched = WanUniPCScheduler(cfg)
    state = sched.prepare(TARGET, seed=1)
    single = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=4.0,
                             self_attn_type="xla", cross_attn_type="xla")
    ref = single(params, state, _ctx(2), _ctx(3))

    mesh = build_mesh({"dp": 2, "sp": 4})
    sharded = make_denoise_fn(ARCH, sched, TARGET, enable_cfg=True, guide_scale=4.0,
                              self_attn_type="xla", cross_attn_type="xla",
                              mesh=mesh, sp_size=4)
    out = sharded(params, state, _ctx(2), _ctx(3))
    np.testing.assert_allclose(np.asarray(out["latents"]), np.asarray(ref["latents"]),
                               rtol=0.05, atol=0.05)
