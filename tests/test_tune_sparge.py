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
    # chosen values come from the grid, or the 0.0 densest-in-cap fallback
    assert all(np.isclose((*grid, 0.0), float(v)).any() for v in l1s)
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


def test_head_chunked_eval_identical(tiny_setup):
    """eval_head_chunk is a pure capacity knob (the native-720P tune's
    part-16 OOM fix): sparge selection is per-(batch, head) independent
    and ratio-of-sums == ratio-of-means, so chunked SNR grids must equal
    the whole-tensor eval EXACTLY (same grid -> same table)."""
    from lightx2v_tpu.tools.tune_sparge import tune_sparge

    arch, params, latents, t, context = tiny_setup
    grid = (0.3, 0.1, 0.02)
    kw = dict(keep_ratio=0.5, l1_grid=grid, bar_db=20.0, block_q=128,
              block_k=128, verbose=False)
    whole = tune_sparge(params, arch, latents, t, context, **kw)
    for chunk in (1, 2):  # num_heads=4: uneven and even splits
        chunked = tune_sparge(params, arch, latents, t, context,
                              head_chunk=chunk, **kw)
        np.testing.assert_array_equal(chunked[0], whole[0])  # same l1 table
        np.testing.assert_allclose(chunked[1], whole[1], atol=1e-3)  # SNRs
        np.testing.assert_array_equal(chunked[2], whole[2])

    with pytest.raises(ValueError, match="must divide"):
        tune_sparge(params, arch, latents, t, context, head_chunk=3, **kw)


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


def _fwd(tiny_setup, self_attn_type, self_attn_kwargs):
    from lightx2v_tpu.models.wan.model import wan_forward
    from lightx2v_tpu.models.wan.pipeline import rope_for_shape

    arch, params, latents, t, context = tiny_setup
    cos, sin, _ = rope_for_shape(arch, latents.shape[1:])
    return wan_forward(
        params, latents, t, context, jnp.asarray(cos), jnp.asarray(sin),
        arch, self_attn_type=self_attn_type,
        self_attn_kwargs=self_attn_kwargs)


def test_dense_prefix_full_equals_flash(tiny_setup):
    """dense_prefix == num_layers turns the whole sparse stack into the
    dense flash forward — the segmented scan's head program IS the dense
    path."""
    arch = tiny_setup[0]
    ref = _fwd(tiny_setup, "flash_attn3", None)
    out = _fwd(tiny_setup, "sparge",
               {"keep_ratio": 0.25, "block_q": 128, "block_k": 128,
                "dense_prefix": arch.num_layers})
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0, atol=0)


def test_dense_prefix_segmented_matches_manual(tiny_setup):
    """dense head + sparse tail == running the stack with a per-layer
    choice: dense flash for layers < p, the sparse kernel above — pinned
    by comparing against keep_ratio=1.0 (selection keeps everything, so
    sparse == dense) with and without the prefix."""
    arch = tiny_setup[0]
    kw = {"keep_ratio": 1.0, "l1": 0.0, "block_q": 128, "block_k": 128}
    ref = _fwd(tiny_setup, "sparge", kw)
    out = _fwd(tiny_setup, "sparge", {**kw, "dense_prefix": 2})
    # keep=1.0 sparge attends to every block, so the prefix only changes
    # the execution path, not the math (both are exact softmax attention)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=5e-2)
    # and a real sparse tail still produces finite output with a prefix
    sparse = _fwd(tiny_setup, "sparge",
                  {"keep_ratio": 0.25, "block_q": 128, "block_k": 128,
                   "dense_prefix": 2,
                   "l1_per_layer": [0.0] * arch.num_layers})
    assert np.isfinite(np.asarray(sparse, np.float32)).all()


def test_runner_derives_dense_prefix_from_table(tmp_path):
    """The runner auto-derives dense_prefix from the table's leading
    failed layers (sparge_ckpt contract)."""
    from lightx2v_tpu.runners.wan_runner import WanRunner

    table = tmp_path / "t.npz"
    np.savez(table,
             l1=np.asarray([0.0, 0.0, 0.3, 0.3], np.float32),
             passed=np.asarray([False, False, True, True]),
             keep_ratio=np.float32(0.3), bar_db=np.float32(25.0))
    cfg = {
        "model_cls": "wan2.1", "task": "t2v", "synthetic_weights": True,
        "infer_steps": 1, "target_video_length": 5, "text_len": 16,
        "target_height": 32, "target_width": 32,
        "sparge": True, "sparge_ckpt": str(table),
    }
    runner = WanRunner.__new__(WanRunner)
    runner.config = cfg

    class _A:  # only num_layers is consulted
        num_layers = 4

    runner.arch = _A()
    attn, cross, kwargs = runner._self_attn_setup()
    assert attn == "sparge"
    assert kwargs["dense_prefix"] == 2
    np.testing.assert_allclose(kwargs["l1_per_layer"],
                               [0.0, 0.0, 0.3, 0.3], atol=1e-6)
