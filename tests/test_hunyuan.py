"""HunyuanVideo MMDiT tests (tiny arch): shapes, mask invariance,
token-replace region, rope table structure."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.hunyuan.config import HunyuanArch
from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward, riflex_k_for
from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_state_dict, load_hunyuan_params

TINY = HunyuanArch(hidden_size=96, heads_num=4, double_blocks=2, single_blocks=2,
                   mlp_hidden_dim=192, in_channels=4, out_channels=4,
                   text_states_dim=32, text_states_dim_2=16,
                   rope_dim_list=(4, 10, 10), rope_theta=256.0)


@pytest.fixture(scope="module")
def params():
    return load_hunyuan_params(init_random_hunyuan_state_dict(TINY, seed=0, scale=0.05), TINY)


def make_inputs(seed=0, Lt=12, FHW=(2, 4, 6)):
    rng = np.random.default_rng(seed)
    F, H, W = FHW
    latents = jnp.asarray(rng.standard_normal((1, 4, F, H, W)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ts = jnp.asarray(rng.standard_normal((1, Lt, 32)), jnp.float32)
    mask = np.zeros((1, Lt), np.int32)
    mask[0, :7] = 1
    ts2 = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    return latents, t, ts, jnp.asarray(mask), ts2


def fwd(params, latents, t, ts, mask, ts2, **kw):
    f, h, w = latents.shape[2], latents.shape[3] // 2, latents.shape[4] // 2
    cos, sin = build_hunyuan_rope(TINY, f, h, w)
    return hunyuan_forward(params, latents, t, ts, mask, ts2,
                           jnp.asarray(cos), jnp.asarray(sin), TINY,
                           guidance=jnp.asarray([6000.0]), attn_type="xla", **kw)


def test_shapes_and_finite(params):
    latents, t, ts, mask, ts2 = make_inputs()
    out = fwd(params, latents, t, ts, mask, ts2)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_masked_text_invariance(params):
    """Changing text states beyond the mask must not change the output —
    validates the dynamic kv_len masking of the joint [img; txt] attention."""
    latents, t, ts, mask, ts2 = make_inputs()
    out1 = np.asarray(fwd(params, latents, t, ts, mask, ts2), np.float32)
    ts_mod = np.asarray(ts).copy()
    ts_mod[0, 7:] += 3.0  # masked positions only
    out2 = np.asarray(fwd(params, latents, t, jnp.asarray(ts_mod), mask, ts2), np.float32)
    np.testing.assert_allclose(out1, out2, atol=1e-5)
    # and changing a VALID position must change the output
    ts_mod2 = np.asarray(ts).copy()
    ts_mod2[0, 2] += 3.0
    out3 = np.asarray(fwd(params, latents, t, jnp.asarray(ts_mod2), mask, ts2), np.float32)
    assert np.abs(out3 - out1).max() > 1e-4


def test_token_replace_changes_first_frame_path(params):
    latents, t, ts, mask, ts2 = make_inputs()
    out_plain = np.asarray(fwd(params, latents, t, ts, mask, ts2), np.float32)
    arch_i2v = HunyuanArch(**{**TINY.__dict__, "task": "i2v"})
    out_tr = np.asarray(
        hunyuan_forward(params, latents, t, ts, mask, ts2,
                        *[jnp.asarray(a) for a in build_hunyuan_rope(TINY, 2, 2, 3)],
                        arch_i2v, guidance=jnp.asarray([6000.0]), attn_type="xla",
                        token_replace=True), np.float32)
    # token replace modulates with t=0 vec -> outputs differ
    assert np.abs(out_tr - out_plain).max() > 1e-5


def test_rope_tables():
    cos, sin = build_hunyuan_rope(TINY, 3, 2, 2)
    assert cos.shape == (12, sum(TINY.rope_dim_list) // 2)
    k = riflex_k_for(80)
    assert k is None
    k = riflex_k_for(261)
    assert 4 <= k <= 8
    cos_r, sin_r = build_hunyuan_rope(TINY, 3, 2, 2, riflex_k=2, l_test=3)
    assert not np.allclose(cos, cos_r)


def test_hunyuan_teacache_pipeline():
    import os as _os

    from lightx2v_tpu.infer import build_parser, init_runner
    from lightx2v_tpu.utils.config import set_config

    cfg_path = _os.path.join(_os.path.dirname(__file__), "..", "configs",
                             "hunyuan_t2v_synthetic_smoke.json")
    args = build_parser().parse_args([
        "--model_cls", "hunyuan", "--task", "t2v",
        "--config_json", cfg_path,
        "--prompt", "a forest in the rain",
        "--synthetic_weights",
    ])
    config = set_config(args)
    config.update({"feature_caching": "Tea", "infer_steps": 4, "teacache_thresh": 0.26})
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert np.isfinite(frames).all()
