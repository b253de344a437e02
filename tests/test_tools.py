"""Converter / quantizer / LoRA tool tests + quantized e2e runtime check."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import wan_forward
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.ops.rope import build_wan_rope_grid
from lightx2v_tpu.tools.convert import apply_lora, quantize_model, quantize_tensor, save_quantized
from lightx2v_tpu.tools.lora import extract_lora
from lightx2v_tpu.utils.safetensors_io import load_sharded

ARCH = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
               freq_dim=32, text_len=8, text_dim=16)


def test_quantize_tensor_roundtrip():
    w = np.random.default_rng(0).standard_normal((16, 32)).astype(np.float32) * 0.1
    q, s = quantize_tensor(w, "int8")
    deq = q.astype(np.float32) * s[:, None]
    snr = ((deq - w) ** 2).mean() / (w**2).mean()
    assert snr < 1e-4


def test_quantized_checkpoint_runs_and_matches(tmp_path):
    """Quantize a synthetic Wan checkpoint, reload, run the quant mm path,
    compare against the bf16 forward (the reference's kernel-accuracy
    pattern at model level)."""
    wd = init_random_weight_dict(ARCH, seed=0, scale=0.05)
    qwd = quantize_model({k: np.asarray(v) for k, v in wd.items()}, "int8")
    save_quantized(qwd, str(tmp_path / "q"), layout="single", scheme="int8")

    loaded = load_sharded(str(tmp_path / "q"))
    with open(tmp_path / "q" / "config.json") as f:
        mm_type = json.load(f)["mm_type"]
    assert "int8" in mm_type

    params_q = load_wan_params(loaded, ARCH)
    params_f = load_wan_params(wd, ARCH)
    # blocks' matmuls must be int8 with scales
    assert params_q["blocks"]["self_attn"]["q"]["w"].dtype == jnp.int8
    assert "w_scale" in params_q["blocks"]["self_attn"]["q"]

    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 6)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(ARCH.head_dim, 2, 2, 3)
    kw = dict(self_attn_type="xla", cross_attn_type="xla")
    ref = np.asarray(wan_forward(params_f, latents, t, ctx, jnp.asarray(cos), jnp.asarray(sin), ARCH, **kw), np.float32)
    out = np.asarray(wan_forward(params_q, latents, t, ctx, jnp.asarray(cos), jnp.asarray(sin), ARCH,
                                 mm_type=mm_type, **kw), np.float32)
    snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
    assert snr < 1e-2, f"quantized model SNR {snr}"


def test_block_layout(tmp_path):
    wd = {f"blocks.{i}.ffn.0.weight": np.ones((4, 4), np.float32) for i in range(3)}
    wd["head.weight"] = np.ones((2, 2), np.float32)
    save_quantized(wd, str(tmp_path / "b"), layout="blocks")
    files = sorted(os.listdir(tmp_path / "b"))
    assert "non_block.safetensors" in files
    assert sum(f.startswith("block_") for f in files) == 3


def test_lora_extract_then_merge_roundtrip():
    rng = np.random.default_rng(2)
    base = {"blocks.0.ffn.0.weight": rng.standard_normal((32, 48)).astype(np.float32)}
    delta_a = rng.standard_normal((4, 48)).astype(np.float32) * 0.1
    delta_b = rng.standard_normal((32, 4)).astype(np.float32) * 0.1
    tuned = {"blocks.0.ffn.0.weight": base["blocks.0.ffn.0.weight"] + delta_b @ delta_a}
    lora = extract_lora(base, tuned, rank=4)
    assert "diffusion_model.blocks.0.ffn.0.lora_A.weight" in lora
    merged = {k: v.copy() for k, v in base.items()}
    apply_lora(merged, lora, strength=1.0)
    np.testing.assert_allclose(merged["blocks.0.ffn.0.weight"],
                               tuned["blocks.0.ffn.0.weight"], rtol=1e-4, atol=1e-5)
