"""On-device synthesized bench weights must match the checkpoint loaders'
pytree exactly (same key paths, same shapes) — the bench numbers are only
meaningful if the synthetic params exercise the very same compiled program
the real checkpoints would (bench.py synthesizes on device because the
tunneled chip moves host->device at single-digit MB/s)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest


def _paths_shapes(tree):
    return {jtu.keystr(k): tuple(v.shape) for k, v in jtu.tree_leaves_with_path(tree)}


def _assert_same_tree(ref, dev):
    rs, ds = _paths_shapes(ref), _paths_shapes(dev)
    assert set(rs) == set(ds), f"missing={set(rs) - set(ds)}, extra={set(ds) - set(rs)}"
    bad = {k: (rs[k], ds[k]) for k in rs if rs[k] != ds[k]}
    assert not bad, f"shape mismatches: {bad}"


class TestHunyuanDeviceInit:
    ARCH = dict(hidden_size=128, heads_num=4, double_blocks=2, single_blocks=3,
                mlp_hidden_dim=256, text_states_dim=64, text_states_dim_2=32,
                rope_dim_list=(8, 12, 12))

    def test_tree_matches_loader(self):
        from lightx2v_tpu.models.hunyuan.config import HunyuanArch
        from lightx2v_tpu.models.hunyuan.weights import (
            init_random_hunyuan_params_on_device, init_random_hunyuan_state_dict,
            load_hunyuan_params)

        arch = HunyuanArch(**self.ARCH)
        ref = load_hunyuan_params(init_random_hunyuan_state_dict(arch), arch)
        dev = init_random_hunyuan_params_on_device(arch, scheme="bf16")
        _assert_same_tree(ref, dev)

    @pytest.mark.parametrize("scheme,mm", [
        ("bf16", "Default"),
        ("int8", "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu"),
        ("fp8", "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Tpu"),
    ])
    def test_forward_runs(self, scheme, mm):
        from lightx2v_tpu.models.hunyuan.config import HunyuanArch
        from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward
        from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_params_on_device

        arch = HunyuanArch(**self.ARCH)
        p = init_random_hunyuan_params_on_device(arch, scheme=scheme)
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.bfloat16)
        ts = jnp.asarray(rng.standard_normal((1, 8, 64)) * 0.1, jnp.bfloat16)
        mask = jnp.ones((1, 8), jnp.int32)
        ts2 = jnp.asarray(rng.standard_normal((1, 32)) * 0.1, jnp.bfloat16)
        cos, sin = build_hunyuan_rope(arch, 2, 4, 4)
        out = hunyuan_forward(p, lat, jnp.asarray([500.0], jnp.float32), ts, mask, ts2,
                              cos, sin, arch, guidance=jnp.asarray([6000.0], jnp.float32),
                              mm_type=mm, attn_type="xla")
        assert out.shape == (1, 16, 2, 8, 8)
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestCogDeviceInit:
    ARCH = dict(num_layers=2, num_heads=4, head_dim=16, text_len=8, text_dim=32,
                time_embed_dim=24)

    def test_tree_matches_loader(self):
        from lightx2v_tpu.models.cogvideox.model import (
            CogArch, init_random_cog_params_on_device, init_random_cog_state_dict,
            load_cog_params)

        arch = CogArch(**self.ARCH)
        ref = load_cog_params(init_random_cog_state_dict(arch), arch)
        dev = init_random_cog_params_on_device(arch)
        _assert_same_tree(ref, dev)

    @pytest.mark.parametrize("scheme,mm", [
        ("bf16", "Default"),
        ("int8", "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu"),
    ])
    def test_forward_runs(self, scheme, mm):
        from lightx2v_tpu.models.cogvideox.model import (
            CogArch, build_cog_rope, cog_forward, init_random_cog_params_on_device)

        arch = CogArch(**self.ARCH)
        p = init_random_cog_params_on_device(arch, scheme=scheme)
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.bfloat16)
        ctx = jnp.asarray(rng.standard_normal((1, 8, 32)) * 0.1, jnp.bfloat16)
        cos, sin = build_cog_rope(arch, 1, 4, 4)
        out = cog_forward(p, lat, jnp.asarray([500.0], jnp.float32), ctx,
                          jnp.asarray(cos), jnp.asarray(sin), arch,
                          mm_type=mm, attn_type="xla")
        assert out.shape == (1, 16, 2, 8, 8)
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestWanI2VDeviceInit:
    def test_i2v_forward_runs(self):
        """BENCH_TASK=i2v path: img_emb + k_img/v_img leaves exist and the
        forward consumes y + clip_fea."""
        import dataclasses

        from lightx2v_tpu.models.wan.config import WanArch
        from lightx2v_tpu.models.wan.model import wan_forward
        from lightx2v_tpu.models.wan.pipeline import rope_for_shape
        from lightx2v_tpu.models.wan.weights import init_random_params_on_device

        arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=20,
                       out_dim=4, freq_dim=32, text_len=8, text_dim=16,
                       clip_dim=24, task="i2v")
        p = init_random_params_on_device(arch, scheme="bf16")
        rng = np.random.default_rng(0)
        target = (4, 2, 4, 8)
        cos, sin, _ = rope_for_shape(arch, target)
        lat = jnp.asarray(rng.standard_normal((1, *target)), jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((1, arch.in_dim - 4, 2, 4, 8)), jnp.bfloat16)
        clip_fea = jnp.asarray(rng.standard_normal((1, 257, arch.clip_dim)), jnp.bfloat16)
        ctx = jnp.asarray(rng.standard_normal((1, 8, 16)) * 0.1, jnp.bfloat16)
        out = wan_forward(p, lat, jnp.asarray([500.0], jnp.float32), ctx, cos, sin,
                          arch, y=y, clip_fea=clip_fea,
                          self_attn_type="xla", cross_attn_type="xla")
        assert out.shape == (1, 4, 2, 4, 8)
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestStructuredQuantizedChunkedInit:
    """init_structured_quantized_params_on_device: the 14B-scale chunked
    generate->structure->quantize pipeline must produce the same pytree
    as the quantized one-shot path (shapes/dtypes), with non-flat
    per-layer structure (the point of structuring)."""

    def _arch(self):
        from lightx2v_tpu.models.wan.config import WanArch

        return WanArch(dim=128, ffn_dim=256, num_heads=4, num_layers=5,
                       in_dim=4, out_dim=4, freq_dim=32, text_len=8,
                       text_dim=16)

    def test_tree_matches_unchunked_quantized(self):
        from lightx2v_tpu.models.wan.weights import (
            init_random_params_on_device,
            init_structured_quantized_params_on_device)

        arch = self._arch()
        ref = init_random_params_on_device(arch, scheme="int4", seed=0)
        dev = init_structured_quantized_params_on_device(
            arch, "int4", seed=0, chunk_layers=2)  # 5 layers -> 3 chunks (ragged tail)
        _assert_same_tree(ref, dev)
        rd = {jtu.keystr(k): v.dtype for k, v in jtu.tree_leaves_with_path(ref)}
        dd = {jtu.keystr(k): v.dtype for k, v in jtu.tree_leaves_with_path(dev)}
        assert rd == dd

    def test_structure_is_nonflat_and_forward_runs(self):
        from lightx2v_tpu.models.wan.model import wan_forward
        from lightx2v_tpu.models.wan.pipeline import rope_for_shape
        from lightx2v_tpu.models.wan.weights import (
            init_structured_quantized_params_on_device)

        arch = self._arch()
        params = init_structured_quantized_params_on_device(
            arch, "int8", seed=0, chunk_layers=2)
        # per-layer weight scales must differ layer to layer (independent
        # chunk draws + lognormal channel outliers)
        ws = np.asarray(params["blocks"]["self_attn"]["q"]["w_scale"], np.float32)
        assert ws.std(axis=1).min() > 0, "flat channel scales — structuring missing"
        assert not np.allclose(ws[0], ws[-1])
        target = (4, 2, 4, 8)
        cos, sin, _ = rope_for_shape(arch, target)
        lat = jnp.asarray(np.random.default_rng(0).standard_normal((1, *target)) * 0.5,
                          jnp.bfloat16)
        ctx = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 16)) * 0.1,
                          jnp.bfloat16)
        out = wan_forward(params, lat, jnp.asarray([500.0], jnp.float32), ctx,
                          jnp.asarray(cos), jnp.asarray(sin), arch,
                          mm_type="W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu",
                          self_attn_type="xla", cross_attn_type="xla")
        assert np.isfinite(np.asarray(out, np.float32)).all()
