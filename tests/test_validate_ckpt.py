"""tools/validate_ckpt: one-command real-checkpoint validation, exercised
on synthetic checkpoints in every supported family's exact key layout."""

import json
import os

import numpy as np
import pytest

from lightx2v_tpu.tools.validate_ckpt import build_parser, main
from lightx2v_tpu.utils import safetensors_io as st


def _save(tmp_path, sd, name="model.safetensors"):
    p = os.path.join(str(tmp_path), name)
    st.save_file({k: np.asarray(v) for k, v in sd.items()}, p)
    return p


def test_wan_dit_pass_and_forward(tmp_path, capsys):
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict

    arch = WanArch(dim=128, ffn_dim=256, num_heads=1, num_layers=2,
                   freq_dim=64, text_dim=32)
    p = _save(tmp_path, init_random_weight_dict(arch, seed=0, scale=0.02))
    rc = main(["--model_cls", "wan2.1", "--ckpt", p, "--num_heads", "1"])
    out = capsys.readouterr().out
    assert rc == 0 and "RESULT: PASS" in out
    assert '"key_coverage_ok": true' in out
    assert '"component": "wan dit forward"' in out


def test_wan_dit_detects_missing_key(tmp_path, capsys):
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict

    arch = WanArch(dim=128, ffn_dim=256, num_heads=1, num_layers=2,
                   freq_dim=64, text_dim=32)
    sd = init_random_weight_dict(arch, seed=0, scale=0.02)
    del sd["blocks.1.ffn.2.weight"]
    p = _save(tmp_path, sd)
    with pytest.raises(KeyError):
        main(["--model_cls", "wan2.1", "--ckpt", p, "--num_heads", "1",
              "--no-forward"])


def test_wan_dit_detects_unused_key(tmp_path, capsys):
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict

    arch = WanArch(dim=128, ffn_dim=256, num_heads=1, num_layers=2,
                   freq_dim=64, text_dim=32)
    sd = init_random_weight_dict(arch, seed=0, scale=0.02)
    sd["mystery.extra.weight"] = np.zeros((4, 4), np.float32)
    p = _save(tmp_path, sd)
    rc = main(["--model_cls", "wan2.1", "--ckpt", p, "--num_heads", "1",
               "--no-forward"])
    out = capsys.readouterr().out
    assert rc == 1 and "RESULT: FAIL" in out
    assert "mystery.extra.weight" in out


def test_hunyuan_dit_key_coverage(tmp_path, capsys):
    from lightx2v_tpu.models.hunyuan.config import HunyuanArch
    from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_state_dict

    arch = HunyuanArch(hidden_size=64, heads_num=2, double_blocks=1,
                       single_blocks=2, mlp_hidden_dim=128,
                       text_states_dim=48, text_states_dim_2=24)
    p = _save(tmp_path, init_random_hunyuan_state_dict(arch, seed=1))
    rc = main(["--model_cls", "hunyuan", "--ckpt", p, "--num_heads", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "RESULT: PASS" in out


def test_cog_dit_key_coverage(tmp_path, capsys):
    from lightx2v_tpu.models.cogvideox.model import CogArch, init_random_cog_state_dict

    arch = CogArch(num_layers=2, num_heads=2, head_dim=16, text_dim=32)
    p = _save(tmp_path, init_random_cog_state_dict(arch, seed=2))
    rc = main(["--model_cls", "cogvideox", "--ckpt", p, "--num_heads", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "RESULT: PASS" in out


def test_hunyuan_vae_component(tmp_path, capsys):
    from lightx2v_tpu.vae.hunyuan_vae import (HunyuanVAEConfig,
                                              init_random_hunyuan_vae_state_dict)

    cfg = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                           latent_channels=4, norm_num_groups=4)
    p = _save(tmp_path, init_random_hunyuan_vae_state_dict(cfg, seed=3))
    rc = main(["--model_cls", "hunyuan", "--component", "vae", "--ckpt", p,
               "--vae_groups", "4"])
    out = capsys.readouterr().out
    assert rc == 0 and "RESULT: PASS" in out


def test_psnr_report(tmp_path, capsys):
    from lightx2v_tpu.models.wan.config import WanArch
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict

    arch = WanArch(dim=128, ffn_dim=256, num_heads=1, num_layers=1,
                   freq_dim=64, text_dim=32)
    p = _save(tmp_path, init_random_weight_dict(arch, seed=0, scale=0.02))
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 255, (4, 16, 16, 3)).astype(np.float32)
    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(a, ref)
    np.save(b, ref + rng.normal(0, 1.0, ref.shape).astype(np.float32))
    rc = main(["--model_cls", "wan2.1", "--ckpt", p, "--num_heads", "1",
               "--no-forward", "--ref-frames", a, "--gen-frames", b])
    out = capsys.readouterr().out
    assert '"component": "psnr"' in out
    # ~48 dB for sigma=1 noise on 0..255 range: passes the 35 dB bar
    assert rc == 0 and "RESULT: PASS" in out
