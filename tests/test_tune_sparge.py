"""Per-layer sparge l1 tuner (tools/tune_sparge.py) — the reference's
sparge_ckpt tuning workflow analog (attn_weight.py:242-291)."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_params_on_device

    arch = WanArch(dim=128, ffn_dim=256, num_heads=4, num_layers=3,
                   in_dim=16, out_dim=16, text_len=32, text_dim=128)
    params = init_random_params_on_device(arch, scheme="bf16", seed=3)
    rng = np.random.default_rng(7)
    latents = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)) * 0.5, jnp.bfloat16)
    context = jnp.asarray(rng.standard_normal((1, 32, 128)) * 0.1, jnp.bfloat16)
    t = jnp.asarray([500.0], jnp.float32)
    return arch, params, latents, t, context


def test_tune_sparge_emits_valid_table(tiny_setup, tmp_path):
    from lightx2v_tpu.tools.tune_sparge import tune_sparge

    arch, params, latents, t, context = tiny_setup
    grid = (0.3, 0.1, 0.02)
    l1s, snrs, passed = tune_sparge(
        params, arch, latents, t, context, keep_ratio=0.5, l1_grid=grid,
        bar_db=20.0, block_q=128, block_k=128, verbose=False)
    assert l1s.shape == (arch.num_layers,)
    assert snrs.shape == (arch.num_layers,)
    assert all(np.isclose(grid, float(v)).any() for v in l1s)
    # every passed layer's chosen candidate met the bar
    assert np.all(snrs[passed] >= 20.0)
    # the table round-trips through the sparge_ckpt npz contract
    out = tmp_path / "sparge_tuned.npz"
    np.savez(out, l1=l1s)
    loaded = np.load(out)["l1"]
    np.testing.assert_array_equal(loaded, l1s)


def test_tuned_table_runs_through_transformer(tiny_setup):
    """The emitted per-layer table drives the model via
    self_attn_kwargs['l1_per_layer'] (what sparge_ckpt resolves to)."""
    from lightx2v_tpu.models.wan.model import wan_forward
    from lightx2v_tpu.models.wan.pipeline import rope_for_shape
    from lightx2v_tpu.tools.tune_sparge import tune_sparge

    arch, params, latents, t, context = tiny_setup
    l1s, _, _ = tune_sparge(
        params, arch, latents, t, context, keep_ratio=0.5,
        l1_grid=(0.3, 0.05), bar_db=15.0, block_q=128, block_k=128,
        verbose=False)
    cos, sin, _ = rope_for_shape(arch, latents.shape[1:])
    out = wan_forward(
        params, latents, t, context, jnp.asarray(cos), jnp.asarray(sin), arch,
        self_attn_type="sparge",
        self_attn_kwargs={"keep_ratio": 0.5, "block_q": 128, "block_k": 128,
                          "l1_per_layer": list(map(float, l1s))})
    assert out.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_bar_monotonicity(tiny_setup):
    """A stricter bar never selects a MORE aggressive (larger) l1."""
    from lightx2v_tpu.tools.tune_sparge import tune_sparge

    arch, params, latents, t, context = tiny_setup
    grid = (0.3, 0.1, 0.02)
    loose, _, _ = tune_sparge(params, arch, latents, t, context, keep_ratio=0.5,
                              l1_grid=grid, bar_db=10.0, block_q=128,
                              block_k=128, verbose=False)
    strict, _, strict_ok = tune_sparge(params, arch, latents, t, context,
                                       keep_ratio=0.5, l1_grid=grid,
                                       bar_db=35.0, block_q=128, block_k=128,
                                       verbose=False)
    # fallback layers (nothing met the strict bar) already sit at min(grid)
    assert np.all(strict <= loose)


def test_shipped_tuned_table_artifact():
    """The repo ships a tuned table (configs/sparge/) wired by
    configs/wan_t2v_sparge_tuned.json via the sparge_ckpt key; pin its
    invariants: one entry per 1.3B layer, values inside the grid range,
    bar metadata present, and failed layers at the densest-in-cap 0.0."""
    import json
    import os

    import numpy as np

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = json.load(open(os.path.join(root, "configs/wan_t2v_sparge_tuned.json")))
    table_path = os.path.join(root, cfg["sparge_ckpt"])
    assert os.path.exists(table_path)
    d = np.load(table_path)
    l1, passed = d["l1"], d["passed"]
    assert l1.shape == (30,)  # Wan 1.3B num_layers
    assert float(d["bar_db"]) > 0 and 0 < float(d["keep_ratio"]) <= 1
    assert ((l1 >= 0.0) & (l1 <= 0.3)).all()
    np.testing.assert_array_equal(l1[~passed], 0.0)
    assert passed.sum() >= l1.shape[0] // 2  # most layers sparsifiable
