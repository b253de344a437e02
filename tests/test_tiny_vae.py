"""Tiny VAE (TAEHV/taew2_1) tests: torch fp64 functional oracle for exact
parity with the reference stack semantics (tae.py:158-259), plus shape,
causality, and checkpoint-conversion properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightx2v_tpu.vae.tiny_vae import (
    TinyVAEConfig,
    convert_taehv_state_dict,
    init_random_tiny_vae_params,
    tiny_decode,
    tiny_decode_wan_latents,
    tiny_encode,
)


def _t(w_hwio):
    """HWIO jax weight -> torch OIHW fp64 tensor."""
    return torch.from_numpy(np.transpose(np.asarray(w_hwio, np.float64), (3, 2, 0, 1)))


def _conv(x, p, key="w", bias_key="b", stride=1):
    w = _t(p[key] if key in p else p)
    b = torch.from_numpy(np.asarray(p[bias_key], np.float64)) if bias_key and bias_key in p else None
    pad = 1 if w.shape[-1] == 3 else 0
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def _oracle_mem(p, x, n, t):
    """MemBlock: conv(cat[x, prev_frame]) + skip, relu (tae.py:24-32,75-81)."""
    c = x.shape[1]
    xt = x.reshape(n, t, c, *x.shape[2:])
    mem = F.pad(xt, (0, 0, 0, 0, 0, 0, 1, 0))[:, :t].reshape(x.shape)
    h = torch.cat([x, mem], 1)
    h = F.relu(F.conv2d(h, _t(p["c0_w"]), torch.from_numpy(np.asarray(p["c0_b"], np.float64)), padding=1))
    h = F.relu(F.conv2d(h, _t(p["c1_w"]), torch.from_numpy(np.asarray(p["c1_b"], np.float64)), padding=1))
    h = F.conv2d(h, _t(p["c2_w"]), torch.from_numpy(np.asarray(p["c2_b"], np.float64)), padding=1)
    skip = x if "skip_w" not in p else F.conv2d(x, _t(p["skip_w"]))
    return F.relu(h + skip)


def _oracle_decode(params, lat_nthwc, cfg=TinyVAEConfig()):
    """fp64 reference decode, NCHW internally (tae.py:193-217,248-259)."""
    d = params["decoder"]
    x = torch.from_numpy(np.asarray(lat_nthwc, np.float64)).permute(0, 1, 4, 2, 3)
    n, t = x.shape[:2]
    x = x.reshape(n * t, *x.shape[2:])
    x = torch.tanh(x / 3) * 3
    x = F.relu(_conv(x, d, "in_w", "in_b"))
    time_up = (None,) + tuple(cfg.decoder_time_upscale)
    for i in range(3):
        for j in range(3):
            x = _oracle_mem(d[f"s{i}_mem{j}"], x, n, t)
        if cfg.decoder_space_upscale[i]:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        stride = 1 if time_up[i] in (None, False) else 2
        y = F.conv2d(x, _t(d[f"s{i}_grow"]["w"]))
        c = y.shape[1] // stride
        x = y.reshape(-1, c, *y.shape[2:])  # channel-major split into frames
        t = t * stride
        x = _conv(x, d, f"s{i}_out_w", None)
        if i == 2:
            x = F.relu(x)
    x = _conv(x, d, "out_w", "out_b")
    x = x.reshape(n, t, *x.shape[1:])[:, cfg.frames_to_trim:]
    # decode_video semantics: ~[0,1] out; the Wan *2-1 map lives in the adapter
    return x.permute(0, 1, 3, 4, 2).numpy()


def _oracle_encode(params, vid_nthwc):
    """fp64 reference encode (tae.py:171-190,236-246)."""
    e = params["encoder"]
    x = torch.from_numpy(np.asarray(vid_nthwc, np.float64)).permute(0, 1, 4, 2, 3)
    n, t = x.shape[:2]
    x = x.reshape(n * t, *x.shape[2:])
    x = F.relu(_conv(x, e, "in_w", "in_b"))
    for i, stride in enumerate((2, 2, 1)):
        if stride > 1:
            c = x.shape[1]
            x = x.reshape(-1, stride * c, *x.shape[2:])  # frame-major stack
            t = t // stride
        x = F.conv2d(x, _t(e[f"s{i}_pool"]["w"]))
        x = _conv(x, {"w": e[f"s{i}_down_w"]}, "w", None, stride=2)
        for j in range(3):
            x = _oracle_mem(e[f"s{i}_mem{j}"], x, n, t)
    x = _conv(x, e, "out_w", "out_b")
    return x.reshape(n, t, *x.shape[1:]).permute(0, 1, 3, 4, 2).numpy()


@pytest.fixture(scope="module")
def params():
    return init_random_tiny_vae_params(seed=0)


def test_decode_matches_torch_oracle(params):
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((1, 3, 4, 6, 16)).astype(np.float32)
    out = np.asarray(tiny_decode(params, jnp.asarray(lat)), np.float32)
    ref = _oracle_decode(params, lat).astype(np.float32)
    assert out.shape == ref.shape == (1, 9, 32, 48, 3)  # 4*3-3 frames, 8x space
    # fp32 vs fp64 accumulation noise through 11 convs; a layout/order bug
    # would produce uncorrelated garbage, not 5e-3-relative drift
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99999


def test_encode_matches_torch_oracle(params):
    rng = np.random.default_rng(1)
    vid = rng.uniform(0, 1, (1, 8, 32, 48, 3)).astype(np.float32)
    out = np.asarray(tiny_encode(params, jnp.asarray(vid)), np.float32)
    ref = _oracle_encode(params, vid).astype(np.float32)
    assert out.shape == ref.shape == (1, 2, 4, 6, 16)
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99999


def test_decode_is_temporally_causal(params):
    """MemBlocks only look backward: perturbing latent frame k leaves
    output frames < 4k-3 unchanged."""
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((1, 4, 4, 4, 16)).astype(np.float32)
    base = np.asarray(tiny_decode(params, jnp.asarray(lat)), np.float32)
    lat2 = lat.copy()
    lat2[:, 3] += 10.0
    out = np.asarray(tiny_decode(params, jnp.asarray(lat2)), np.float32)
    # latent frame 3 -> raw output frames 12..15 -> after trim(3): 9..12
    np.testing.assert_allclose(out[:, :9], base[:, :9], atol=1e-5)
    assert np.abs(out[:, 9:] - base[:, 9:]).max() > 1e-3


def test_convert_reference_state_dict_roundtrip(params):
    """Build a torch-style state dict with the reference's Sequential key
    names (tae.py:171-217) from our params, convert, and check identity."""
    sd = {}

    def put(key, w_hwio, bias=None):
        sd[key + ".weight"] = np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1))
        if bias is not None:
            sd[key + ".bias"] = np.asarray(bias, np.float32)

    e, d = params["encoder"], params["decoder"]
    put("encoder.0", e["in_w"], e["in_b"])
    for i, (pool_i, down_i, mems) in enumerate(((2, 3, (4, 5, 6)), (7, 8, (9, 10, 11)), (12, 13, (14, 15, 16)))):
        put(f"encoder.{pool_i}.conv", e[f"s{i}_pool"]["w"])
        put(f"encoder.{down_i}", e[f"s{i}_down_w"])
        for j, m in enumerate(mems):
            mp = e[f"s{i}_mem{j}"]
            put(f"encoder.{m}.conv.0", mp["c0_w"], mp["c0_b"])
            put(f"encoder.{m}.conv.2", mp["c1_w"], mp["c1_b"])
            put(f"encoder.{m}.conv.4", mp["c2_w"], mp["c2_b"])
    put("encoder.17", e["out_w"], e["out_b"])
    put("decoder.1", d["in_w"], d["in_b"])
    for i, (mems, grow_i, out_i) in enumerate((((3, 4, 5), 7, 8), ((9, 10, 11), 13, 14), ((15, 16, 17), 19, 20))):
        for j, m in enumerate(mems):
            mp = d[f"s{i}_mem{j}"]
            put(f"decoder.{m}.conv.0", mp["c0_w"], mp["c0_b"])
            put(f"decoder.{m}.conv.2", mp["c1_w"], mp["c1_b"])
            put(f"decoder.{m}.conv.4", mp["c2_w"], mp["c2_b"])
            if "skip_w" in mp:
                put(f"decoder.{m}.skip", mp["skip_w"])
        put(f"decoder.{grow_i}.conv", d[f"s{i}_grow"]["w"])
        put(f"decoder.{out_i}", d[f"s{i}_out_w"])
    put("decoder.22", d["out_w"], d["out_b"])
    # decoder MemBlocks at 256ch have no skip in params (same in/out);
    # reference stacks also have none for equal channels -> keys match.

    conv = convert_taehv_state_dict(sd)
    for top in ("encoder", "decoder"):
        for k, v in params[top].items():
            got = conv[top][k]
            if isinstance(v, dict):
                for kk in v:
                    np.testing.assert_allclose(np.asarray(got[kk]), np.asarray(v[kk]), atol=1e-6)
            else:
                np.testing.assert_allclose(np.asarray(got), np.asarray(v), atol=1e-6)


def test_tgrow_patch_slices_last_channels(params):
    """patch_tgrow_layers (tae.py:221-234): with time upscale disabled the
    checkpoint's 2x TGrow weight keeps only the last C output channels."""
    cfg = TinyVAEConfig(decoder_time_upscale=(False, False))
    sd = {}
    rng = np.random.default_rng(3)
    # minimal: only the tgrow keys matter for this check; fill the rest
    full = init_random_tiny_vae_params(seed=5)  # 2x strides

    def put(key, w_hwio, bias=None):
        sd[key + ".weight"] = np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1))
        if bias is not None:
            sd[key + ".bias"] = np.asarray(bias, np.float32)

    e, d = full["encoder"], full["decoder"]
    put("encoder.0", e["in_w"], e["in_b"])
    for i, (pool_i, down_i, mems) in enumerate(((2, 3, (4, 5, 6)), (7, 8, (9, 10, 11)), (12, 13, (14, 15, 16)))):
        put(f"encoder.{pool_i}.conv", e[f"s{i}_pool"]["w"])
        put(f"encoder.{down_i}", e[f"s{i}_down_w"])
        for j, m in enumerate(mems):
            mp = e[f"s{i}_mem{j}"]
            put(f"encoder.{m}.conv.0", mp["c0_w"], mp["c0_b"])
            put(f"encoder.{m}.conv.2", mp["c1_w"], mp["c1_b"])
            put(f"encoder.{m}.conv.4", mp["c2_w"], mp["c2_b"])
    put("encoder.17", e["out_w"], e["out_b"])
    put("decoder.1", d["in_w"], d["in_b"])
    for i, (mems, grow_i, out_i) in enumerate((((3, 4, 5), 7, 8), ((9, 10, 11), 13, 14), ((15, 16, 17), 19, 20))):
        for j, m in enumerate(mems):
            mp = d[f"s{i}_mem{j}"]
            put(f"decoder.{m}.conv.0", mp["c0_w"], mp["c0_b"])
            put(f"decoder.{m}.conv.2", mp["c1_w"], mp["c1_b"])
            put(f"decoder.{m}.conv.4", mp["c2_w"], mp["c2_b"])
        put(f"decoder.{grow_i}.conv", d[f"s{i}_grow"]["w"])
        put(f"decoder.{out_i}", d[f"s{i}_out_w"])
    put("decoder.22", d["out_w"], d["out_b"])

    conv = convert_taehv_state_dict(sd, cfg)
    # stage1 grow in checkpoint is 128->256 (2x); patched keeps last 128
    src = np.asarray(d["s1_grow"]["w"])
    got = np.asarray(conv["decoder"]["s1_grow"]["w"])
    assert got.shape[-1] == 128
    np.testing.assert_allclose(got, src[..., -128:], atol=1e-6)
    # and decode with no time upscale keeps T (trim 0), upscales space 8x
    lat = np.random.default_rng(4).standard_normal((1, 2, 4, 4, 16)).astype(np.float32)
    out = tiny_decode(conv, jnp.asarray(lat), cfg)
    assert out.shape == (1, 2, 32, 32, 3)


def test_wan_latents_adapter(params):
    lat = np.random.default_rng(5).standard_normal((16, 3, 4, 6)).astype(np.float32)
    out = np.asarray(tiny_decode_wan_latents(params, jnp.asarray(lat)))
    assert out.shape == (9, 32, 48, 3)


def test_runner_tiny_vae_e2e(tmp_path):
    """tiny_vae: true end-to-end through the Wan runner (reference
    wan_runner.py:143-152 wiring)."""
    import os

    from lightx2v_tpu.infer import build_parser, init_runner
    from lightx2v_tpu.utils.config import set_config

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", cfg_path, "--synthetic_weights",
    ])
    config = set_config(args)
    config["tiny_vae"] = True
    config["infer_steps"] = 1
    config["save_video_path"] = str(tmp_path / "tiny.mp4")
    runner = init_runner(config)
    runner.run_pipeline()
    assert (tmp_path / "tiny.mp4").is_file()
