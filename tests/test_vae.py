"""Wan causal 3D VAE tests.

The streaming-prefix property is the key correctness check for the
scan+cache design: a causal streaming decoder must satisfy
decode(z[:, :k]) == decode(z)[:, :(k-1)*4+1] exactly — this exercises the
whole cache pytree (the reference validates its ring/cache logic the same
way, single-process; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightx2v_tpu.vae.wan_vae import (
    WanVAEConfig,
    cconv3d,
    init_random_vae_state_dict,
    load_wan_vae_params,
    vae_decode,
    vae_encode,
)

TINY = WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
                    temperal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def params():
    sd = init_random_vae_state_dict(TINY, seed=0)
    return load_wan_vae_params(sd, TINY)


def test_cconv3d_matches_torch_causal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 6, 6, 3)).astype(np.float32)  # B,T,H,W,C
    w = rng.standard_normal((4, 3, 3, 3, 3)).astype(np.float32)  # O,I,kt,kh,kw
    b = rng.standard_normal(4).astype(np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)), "b": jnp.asarray(b)}
    ours = cconv3d(p, jnp.asarray(x), None)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # B,C,T,H,W
    xt = F.pad(xt, (1, 1, 1, 1, 2, 0))  # causal temporal left pad 2
    ref = F.conv3d(xt, torch.from_numpy(w), torch.from_numpy(b)).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


class TestDecode:
    def test_shapes(self, params):
        z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 5, 4, 6, 4)), jnp.float32)
        out = vae_decode(params, z, TINY, scale=False)
        assert out.shape == (1, 17, 32, 48, 3)  # (5-1)*4+1 frames, x8 spatial

    def test_single_frame(self, params):
        z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 4, 6, 4)), jnp.float32)
        out = vae_decode(params, z, TINY, scale=False)
        assert out.shape == (1, 1, 32, 48, 3)

    def test_streaming_prefix_property(self, params):
        rng = np.random.default_rng(2)
        z = jnp.asarray(rng.standard_normal((1, 5, 4, 4, 4)), jnp.float32)
        full = vae_decode(params, z, TINY, scale=False)
        prefix = vae_decode(params, z[:, :3], TINY, scale=False)
        np.testing.assert_allclose(np.asarray(prefix), np.asarray(full)[:, :9], rtol=1e-4, atol=1e-4)

    def test_chunked_equals_per_frame(self, params):
        # k frames per scan step sees the exact same causal-conv windows as
        # the per-frame stream (cconv3d cache is the last 2 frames either
        # way) — outputs must match to float tolerance for every k
        rng = np.random.default_rng(8)
        z = jnp.asarray(rng.standard_normal((1, 7, 4, 4, 4)), jnp.float32)  # t1=6
        ref = np.asarray(vae_decode(params, z, TINY, scale=False, chunk=1))
        for k in (2, 3, 6):
            out = np.asarray(vae_decode(params, z, TINY, scale=False, chunk=k))
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4, err_msg=f"chunk={k}")

    def test_chunk_picks_divisor(self, params):
        # chunk=4 with t1=6 must fall back to k=3 (largest divisor <= 4)
        z = jnp.asarray(np.random.default_rng(9).standard_normal((1, 7, 4, 4, 4)), jnp.float32)
        out = vae_decode(params, z, TINY, scale=False, chunk=4)
        assert out.shape == (1, 25, 32, 32, 3)

    def test_causality(self, params):
        rng = np.random.default_rng(3)
        z = np.asarray(rng.standard_normal((1, 5, 4, 4, 4)), np.float32)
        out1 = np.asarray(vae_decode(params, jnp.asarray(z), TINY, scale=False))
        z2 = z.copy()
        z2[:, 3] += 1.0  # perturb latent frame 3
        out2 = np.asarray(vae_decode(params, jnp.asarray(z2), TINY, scale=False))
        # frames < (3-1)*4+1 = 9 must be identical
        np.testing.assert_allclose(out1[:, :9], out2[:, :9], rtol=1e-5, atol=1e-5)
        assert np.abs(out1[:, 9:] - out2[:, 9:]).max() > 1e-6


def test_spatial_attention_chunked_path_matches_direct(params):
    # h*w > 4096 routes through the online-softmax chunked attention;
    # must equal the materialized-logits einsum to float tolerance
    from lightx2v_tpu.vae import wan_vae as wv

    c = 8
    p = {"norm": {"g": jnp.ones((c,), jnp.float32)},
         "to_qkv": {"w": jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, c, 3 * c)),
                                     jnp.float32) * 0.1, "b": None},
         "proj": {"w": jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, c, c)),
                                   jnp.float32) * 0.1, "b": None}}
    rng = np.random.default_rng(2)
    x_big = jnp.asarray(rng.standard_normal((1, 2, 66, 64, c)), jnp.float32)  # 4224 > 4096
    got = np.asarray(wv.spatial_attention(p, x_big))

    b, t, h, w, _ = x_big.shape
    xn = wv.rms_norm_ch(p["norm"], x_big)
    qkv = wv.conv2d(p["to_qkv"], xn)
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, t, h, w, c)
    ref = np.asarray(x_big + wv.conv2d(p["proj"], out))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestEncode:
    def test_shapes(self, params):
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 9, 32, 32, 3)), jnp.float32)
        z = vae_encode(params, x, TINY, scale=False)
        assert z.shape == (1, 3, 4, 4, 4)  # (9-1)/4+1, /8 spatial

    def test_streaming_prefix_property(self, params):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 9, 16, 16, 3)), jnp.float32)
        full = vae_encode(params, x, TINY, scale=False)
        prefix = vae_encode(params, x[:, :5], TINY, scale=False)
        np.testing.assert_allclose(np.asarray(prefix), np.asarray(full)[:, :2], rtol=1e-4, atol=1e-4)

    def test_chunked_encode_equals_per_step(self, params):
        # k latent steps (4k pixel frames) per scan step must equal the
        # per-step stream: causal-conv caches and the stride-2 time conv's
        # window parity are chunk-size independent
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((1, 25, 16, 16, 3)), jnp.float32)  # 6 latent steps
        ref = np.asarray(vae_encode(params, x, TINY, scale=False, chunk=1))
        for k in (2, 3, 6):
            out = np.asarray(vae_encode(params, x, TINY, scale=False, chunk=k))
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4, err_msg=f"chunk={k}")

    def test_latent_scale_normalization(self, params):
        cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
                           temperal_downsample=(False, True, True))
        p16 = load_wan_vae_params(init_random_vae_state_dict(cfg, seed=1), cfg)
        x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 5, 16, 16, 3)), jnp.float32)
        z = vae_encode(p16, x, cfg, scale=True)
        assert z.shape == (1, 2, 2, 2, 16)
        rt = vae_decode(p16, z, cfg, scale=True)
        assert rt.shape == (1, 5, 16, 16, 3)  # round-trips the frame count


class TestTiling:
    def test_tiled_decode_close_to_full(self, params):
        from lightx2v_tpu.vae.wan_vae import vae_decode_tiled

        z = jnp.asarray(np.random.default_rng(7).standard_normal((1, 3, 8, 12, 4)), jnp.float32)
        full = np.asarray(vae_decode(params, z, TINY, scale=False))
        tiled = np.asarray(vae_decode_tiled(params, z, TINY, scale=False,
                                            tile_latent=6, stride_latent=4))
        assert tiled.shape == full.shape
        c = np.corrcoef(tiled.ravel(), full.ravel())[0, 1]
        assert c > 0.95, f"tiled decode diverged, corr {c}"

    def test_tiled_encode_shapes(self, params):
        from lightx2v_tpu.vae.wan_vae import vae_encode_tiled

        x = jnp.asarray(np.random.default_rng(8).standard_normal((1, 5, 48, 64, 3)), jnp.float32)
        z = vae_encode_tiled(params, x, TINY, scale=False, tile_px=32, stride_px=24)
        assert z.shape == (1, 2, 6, 8, 4)
        assert np.isfinite(np.asarray(z)).all()


def test_int8_decoder_quantization(params):
    """vae_int8 path: decoder-only int8 convs (quantize_vae_decoder_int8),
    mechanically correct (int32-accumulating lax.conv) and within a
    quantization-noise bound of the bf16 decode; encoder stays bf16 so
    i2v conditioning is untouched."""
    from lightx2v_tpu.vae.wan_vae import quantize_vae_decoder_int8

    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((1, 3, 8, 8, TINY.z_dim)), jnp.float32)
    ref = np.asarray(vae_decode(params, z, TINY, scale=False, dtype=jnp.bfloat16, chunk=2), np.float32)

    qp = quantize_vae_decoder_int8(params)
    # encoder subtree untouched (leaf identity), decoder convs int8
    assert qp["encoder"] is params["encoder"]
    n_int8 = sum(1 for l in jax.tree_util.tree_leaves(qp["decoder"])
                 if hasattr(l, "dtype") and l.dtype == jnp.int8)
    assert n_int8 > 10
    # head_conv kept bf16 (quality-critical 3-channel output)
    assert "w_scale" not in qp["decoder"]["head_conv"]

    got = np.asarray(vae_decode(qp, z, TINY, scale=False, dtype=jnp.bfloat16, chunk=2), np.float32)
    err = np.sqrt(((ref - got) ** 2).mean())
    sig = np.sqrt((ref ** 2).mean())
    snr = 20 * np.log10(sig / max(err, 1e-20))
    assert snr > 15.0, f"int8 decode SNR {snr:.1f} dB below bound"
    # idempotence guard: quantizing twice must not re-quantize int8 weights
    qp2 = quantize_vae_decoder_int8(qp)
    assert qp2["decoder"]["conv1"]["w"].dtype == jnp.int8
