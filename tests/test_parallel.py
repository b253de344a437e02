"""Multi-chip tests on the 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8) — the single-host simulated-SP
test capability the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import wan_forward
from lightx2v_tpu.models.wan.sharded import wan_forward_sharded
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.ops.attention import attn_xla
from lightx2v_tpu.parallel.mesh import build_mesh, mesh_axis_size
from lightx2v_tpu.parallel.ulysses import head2seq, seq2head, ulysses_attention
from lightx2v_tpu.ops.rope import build_wan_rope_grid

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = build_mesh({"sp": 8})
    assert mesh_axis_size(mesh, "sp") == 8
    assert mesh_axis_size(mesh, "dp") == 1
    mesh2 = build_mesh({"dp": 2, "sp": 4})
    assert mesh_axis_size(mesh2, "dp") == 2 and mesh_axis_size(mesh2, "sp") == 4


def test_seq2head_roundtrip():
    mesh = build_mesh({"sp": 4, "dp": 2})
    b, s, n, d = 2, 16, 8, 4
    x = jnp.arange(b * s * n * d, dtype=jnp.float32).reshape(b, s, n, d)

    def f(xl):
        return head2seq(seq2head(xl, "sp"), "sp")

    out = jax.shard_map(
        f, mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"), check_vma=False
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_ulysses_attention_matches_dense():
    """Sharded Ulysses attention == single-device dense attention
    (the reference checks this with a torchrun script,
    attentions/distributed/ulysses; here it runs on the virtual mesh)."""
    mesh = build_mesh({"sp": 4, "dp": 2})
    rng = np.random.default_rng(0)
    b, s, n, d = 2, 32, 4, 16
    q, k, v = [jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 0.5 for _ in range(3)]
    ref = attn_xla(q, k, v)

    def f(ql, kl, vl):
        return ulysses_attention(attn_xla, ql, kl, vl, axis="sp")

    out = jax.shard_map(
        f, mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"), check_vma=False
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_sharded_wan_forward_matches_single_device():
    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(1)
    B = 2  # dp=2
    latents = jnp.asarray(rng.standard_normal((B, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((B, 8, 16)), jnp.float32)
    f, h, w = 2, 2, 4  # 16 tokens, sp=4 -> 4 per device
    cos, sin = build_wan_rope_grid(arch.head_dim, f, h, w)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")

    mesh = build_mesh({"dp": 2, "sp": 4})
    out = wan_forward_sharded(params, latents, t, context, cos, sin, arch, mesh,
                              self_attn_type="xla", cross_attn_type="xla")
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.02, atol=0.02)


def test_tensor_parallel_block_matches_single_device():
    """TP-sharded Wan block (heads + FFN over tp, psum row projections,
    full-dim QK-norm stats) == unsharded block."""
    from functools import partial as _partial

    from lightx2v_tpu.models.wan.model import wan_block
    from lightx2v_tpu.ops.linear import resolve_mm
    from lightx2v_tpu.parallel.tensor_parallel import tp_block_specs, wan_block_tp

    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=1, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    block = jax.tree_util.tree_map(lambda a: a, params["blocks"])  # (L=1, ...)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32).astype(jnp.bfloat16)
    e0 = jnp.asarray(rng.standard_normal((1, 6, 64)) * 0.1, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 64)) * 0.1, jnp.bfloat16)
    cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    mm = resolve_mm("Default")

    blk0 = jax.tree_util.tree_map(lambda a: a[0], block)
    ref = wan_block(blk0, x, e0, ctx, None, cos, sin, arch, mm,
                    _partial(attn_xla), _partial(attn_xla))

    mesh = build_mesh({"tp": 4, "dp": 2})
    specs = tp_block_specs()
    # strip the leading L axis from the specs for a single unstacked block
    def drop_l(spec):
        if isinstance(spec, P):
            return P(*spec[1:])
        return spec
    specs1 = jax.tree_util.tree_map(drop_l, specs,
                                    is_leaf=lambda v: isinstance(v, P))

    def f(blk, xx, ee, cc):
        return wan_block_tp(blk, xx, ee, cc, None, cos, sin, arch, mm, attn_xla)

    out = jax.shard_map(
        f, mesh=mesh,
        in_specs=(specs1, P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(blk0, x, e0, ctx)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
    c = np.corrcoef(np.asarray(out, np.float32).ravel(), np.asarray(ref, np.float32).ravel())[0, 1]
    assert c > 0.999


def test_full_mesh_dp_sp_tp_forward():
    """dp=2 x sp=2 x tp=2 combined: sharded forward == single device."""
    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(1)
    B = 2
    latents = jnp.asarray(rng.standard_normal((B, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((B, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")
    mesh = build_mesh({"dp": 2, "sp": 2, "tp": 2})
    out = wan_forward_sharded(params, latents, t, context, cos, sin, arch, mesh,
                              self_attn_type="xla", cross_attn_type="xla")
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=0.03, atol=0.03)


def test_ring_attention_matches_dense_in_mesh():
    """Sharded ring attention (ppermute K/V rotation + LSE merge) ==
    single-device dense attention — the same identity the reference checks
    single-process (attentions/distributed/ring/tests/test.py:16-45)."""
    from lightx2v_tpu.parallel.ring import ring_attention

    mesh = build_mesh({"sp": 4, "dp": 2})
    rng = np.random.default_rng(3)
    b, s, n, d = 2, 32, 4, 16
    q, k, v = [jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 0.5 for _ in range(3)]
    ref = attn_xla(q, k, v)

    out = jax.shard_map(
        lambda ql, kl, vl: ring_attention(ql, kl, vl, axis="sp"),
        mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"), check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_full_wan_forward_matches_ulysses_and_single():
    """parallel_attn_type="ring" through the full sharded Wan forward ==
    Ulysses == single-device (VERDICT r1 #2: the config key must actually
    switch the algorithm; reference wires it via ring/wrap.py +
    models/networks/wan/model.py:53-59)."""
    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(1)
    B = 2
    latents = jnp.asarray(rng.standard_normal((B, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((B, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")
    mesh = build_mesh({"dp": 2, "sp": 4})
    ring = wan_forward_sharded(params, latents, t, context, cos, sin, arch, mesh,
                               self_attn_type="xla", cross_attn_type="xla",
                               parallel_attn_type="ring")
    uly = wan_forward_sharded(params, latents, t, context, cos, sin, arch, mesh,
                              self_attn_type="xla", cross_attn_type="xla",
                              parallel_attn_type="ulysses")
    np.testing.assert_allclose(np.asarray(ring, np.float32), np.asarray(ref, np.float32), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(ring, np.float32), np.asarray(uly, np.float32), rtol=0.02, atol=0.02)


def test_rope_fused_mesh_falls_back_to_xla_rope():
    """arch.rope_fused + mesh must run (XLA rope fallback), not assert —
    and match the unfused single-device forward."""
    from lightx2v_tpu.models.wan.weights import permute_qk_half

    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((2, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")

    import dataclasses
    arch_f = dataclasses.replace(arch, rope_fused=True)
    params_f = permute_qk_half(params, arch_f)
    mesh = build_mesh({"dp": 2, "sp": 4})
    out = wan_forward_sharded(params_f, latents, t, context, cos, sin, arch_f, mesh,
                              self_attn_type="xla", cross_attn_type="xla")
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.02, atol=0.02)


@pytest.mark.parametrize("mesh_shape,algo", [
    ({"dp": 2, "sp": 4}, "ulysses"),  # fused dataflow: tables replicated, rotation after all_to_all
    ({"dp": 2, "sp": 4}, "ring"),     # ring pre-rotates locally (half-split XLA pass)
    ({"sp": 2, "tp": 2}, "ulysses"),  # wan_block_tp rope_fused branch + ulysses
    ({"dp": 2, "tp": 4}, "ulysses"),  # tp-only heads: kernel-direct full-seq rotation
])
def test_rope_fused_mesh_matches_unfused(mesh_shape, algo):
    """arch.rope_fused under every mesh/algo combination must equal the
    unfused single-device forward. flash_attn3 routes the rope tables into
    the attention dispatch (in-kernel on TPU; the CPU fallback applies the
    identical half-split rotation at the same point in the dataflow), so
    this pins the table sharding (replicated vs sp-sliced), the
    post-all_to_all rotation positions, and the wan_block_tp branch that
    used to apply plain apply_rope to half-split-permuted projections."""
    import dataclasses

    from lightx2v_tpu.models.wan.weights import permute_qk_half

    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((2, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla")

    arch_f = dataclasses.replace(arch, rope_fused=True)
    params_f = permute_qk_half(params, arch_f)
    mesh = build_mesh(mesh_shape)
    out = wan_forward_sharded(params_f, latents, t, context, cos, sin, arch_f, mesh,
                              self_attn_type="flash_attn3", cross_attn_type="xla",
                              parallel_attn_type=algo)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)


def test_taylor_caching_with_mesh_matches_single_device():
    """TaylorSeer caching under a dp x sp mesh (GSPMD-sharded path — round 1
    raised NotImplementedError here) == the single-device cached run."""
    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    params = load_wan_params(init_random_weight_dict(arch, seed=0, scale=0.05), arch)
    target = (4, 2, 4, 8)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)

    def run(mesh):
        cfg = ConfigDict({"infer_steps": 5, "sample_shift": 5.0})
        sched = WanUniPCScheduler(cfg)
        state = sched.prepare(target, seed=0)
        d = make_denoise_fn(arch, sched, target, enable_cfg=True, guide_scale=5.0,
                            self_attn_type="xla", cross_attn_type="xla",
                            feature_caching="TaylorSeer", caching_config=cfg,
                            mesh=mesh, sp_size=1 if mesh is None else 4)
        return np.asarray(d(params, state, ctx, ctx * 0.5)["latents"], np.float32)

    ref = run(None)
    got = run(build_mesh({"dp": 2, "sp": 4}))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("algo", ["ulysses", "ring"])
def test_sharded_forward_masks_sp_pad_tokens(algo):
    """Tokens NOT dividing sp: the pad rows' K are nonzero (zero
    embeddings pick up modulation shifts), so without masking the
    sharded output diverges from single-device. With kv_tokens threaded
    (ulysses kv_len / ring pad_tail) they must agree."""
    arch = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
                   freq_dim=32, text_len=8, text_dim=16)
    wd = init_random_weight_dict(arch, seed=0, scale=0.05)
    params = load_wan_params(wd, arch)
    rng = np.random.default_rng(3)
    B = 2
    # grid 2x3x3 = 18 tokens; sp=4 pads to 20 -> 2 pad tokens
    latents = jnp.asarray(rng.standard_normal((B, 4, 2, 6, 6)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((B, 8, 16)), jnp.float32)
    from lightx2v_tpu.models.wan.pipeline import rope_for_shape

    cos, sin, seq_len = rope_for_shape(arch, (4, 2, 6, 6), sp_pad=4)
    assert seq_len == 20  # 18 tokens padded to the sp multiple

    ref = wan_forward(params, latents, t, context, cos, sin, arch,
                      self_attn_type="xla", cross_attn_type="xla", seq_len=seq_len)
    mesh = build_mesh({"dp": 2, "sp": 4})
    out = wan_forward_sharded(params, latents, t, context, cos, sin, arch, mesh,
                              self_attn_type="xla", cross_attn_type="xla",
                              seq_len=seq_len, parallel_attn_type=algo)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)

    if algo == "ulysses":
        # fused-rope + pad: kv_len must mask the tail with the rotation
        # happening post-all_to_all at padded-table positions
        import dataclasses

        from lightx2v_tpu.models.wan.weights import permute_qk_half

        arch_f = dataclasses.replace(arch, rope_fused=True)
        params_f = permute_qk_half(params, arch_f)
        out_f = wan_forward_sharded(params_f, latents, t, context, cos, sin, arch_f, mesh,
                                    self_attn_type="flash_attn3", cross_attn_type="xla",
                                    seq_len=seq_len, parallel_attn_type="ulysses")
        np.testing.assert_allclose(np.asarray(out_f, np.float32), np.asarray(ref, np.float32),
                                   rtol=0.02, atol=0.02)


def test_hunyuan_sharded_matches_single_device():
    """Ulysses over the concatenated img+txt stream (Hunyuan MMDiT;
    reference parallelize_hunyuan, ulysses/wrap.py + hunyuan processor):
    sharded forward == single-device forward."""
    from lightx2v_tpu.models.hunyuan.config import HunyuanArch
    from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward
    from lightx2v_tpu.models.hunyuan.sharded import hunyuan_forward_sharded
    from lightx2v_tpu.models.hunyuan.weights import (
        init_random_hunyuan_state_dict,
        load_hunyuan_params,
    )

    arch = HunyuanArch(hidden_size=64, heads_num=4, double_blocks=2,
                       single_blocks=2, mlp_hidden_dim=128, in_channels=4,
                       out_channels=4, text_states_dim=16, text_states_dim_2=8,
                       rope_dim_list=(4, 6, 6))
    params = load_hunyuan_params(init_random_hunyuan_state_dict(arch, seed=0, scale=0.05), arch)
    rng = np.random.default_rng(0)
    f, h, w = 2, 4, 8  # img tokens = 2*2*4 = 16, divisible by sp=4
    lat = jnp.asarray(rng.standard_normal((1, 4, f, h, w)) * 0.5, jnp.float32)
    ts = jnp.asarray(rng.standard_normal((1, 12, 16)) * 0.2, jnp.float32)
    mask = np.zeros((1, 12), np.int32)
    mask[0, :7] = 1
    mask = jnp.asarray(mask)
    ts2 = jnp.asarray(rng.standard_normal((1, 8)) * 0.2, jnp.float32)
    pt, ph, pw = arch.patch_size
    cos, sin = build_hunyuan_rope(arch, f // pt, h // ph, w // pw)
    t = jnp.asarray([500.0], jnp.float32)
    g = jnp.asarray([6000.0], jnp.float32)

    ref = hunyuan_forward(params, lat, t, ts, mask, ts2, jnp.asarray(cos),
                          jnp.asarray(sin), arch, guidance=g, attn_type="xla")

    mesh = build_mesh({"dp": 2, "sp": 4})
    out = jax.jit(lambda p, l: hunyuan_forward_sharded(
        p, l, t, ts, mask, ts2, jnp.asarray(cos), jnp.asarray(sin), arch,
        mesh, guidance=g, attn_type="xla"))(params, lat)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)


def test_cog_sharded_matches_single_device():
    """Ulysses over CogVideoX's joint [text; video] stream (rotated to
    sharded-part-first around the primitive): sharded == single-device."""
    from lightx2v_tpu.models.cogvideox.model import (
        CogArch,
        build_cog_rope,
        cog_forward,
        init_random_cog_params_on_device,
    )
    from lightx2v_tpu.models.cogvideox.sharded import cog_forward_sharded

    arch = CogArch(num_layers=2, num_heads=4, head_dim=16, text_len=6, text_dim=24)
    params = init_random_cog_params_on_device(arch, scheme="bf16", seed=0)
    rng = np.random.default_rng(1)
    f, h, w = 2, 4, 8  # video tokens = 1*2*4 = 8, divisible by sp=4
    lat = jnp.asarray(rng.standard_normal((1, 16, f, h, w)) * 0.5, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 24)) * 0.2, jnp.float32)
    p_, pt = arch.patch_size, arch.patch_size_t
    fpad = f + ((-f) % pt)
    cos, sin = build_cog_rope(arch, fpad // pt, h // p_, w // p_)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    t = jnp.asarray([500.0], jnp.float32)

    ref = cog_forward(params, lat, t, ctx, cos, sin, arch, attn_type="xla")
    mesh = build_mesh({"dp": 2, "sp": 4})
    out = jax.jit(lambda pa, l: cog_forward_sharded(
        pa, l, t, ctx, cos, sin, arch, mesh, attn_type="xla"))(params, lat)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)
