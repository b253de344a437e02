"""Text/image encoder equivalence against the REFERENCE implementation.

Instantiates the reference's own from-scratch encoder nn.Modules
(lightx2v/models/input_encoders/hf/t5/model.py:284-349,
xlm_roberta/model.py:212-295) on CPU at tiny sizes, loads the SAME
synthetic state dict our loaders consume (strict=True proves two-sided
key/shape coverage), and asserts our JAX forwards reproduce them.
"""

from __future__ import annotations

import numpy as np
import pytest

import reference_harness as rh

pytestmark = pytest.mark.skipif(not rh.reference_available(), reason="/root/reference not present")


def snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = np.square(ref - got).sum()
    return np.inf if err == 0 else 10.0 * np.log10(np.square(ref).sum() / err)


# ------------------------------------------------------------------- T5/UMT5


def t5_cfg(shared_pos: bool):
    from lightx2v_tpu.encoders.t5 import T5Config

    return T5Config(vocab_size=128, dim=32, dim_attn=32, dim_ffn=64,
                    num_heads=2, num_layers=2, num_buckets=8,
                    shared_pos=shared_pos, max_dist=16)


@pytest.mark.parametrize("shared_pos", [False, True],
                         ids=["umt5-per-layer-pos", "t5v11-shared-pos"])
def test_t5_encoder_matches_reference(shared_pos):
    """UMT5 (Wan, per-layer relative pos) and T5-v1.1 (CogVideoX, shared
    pos) vs the reference T5Encoder with a ragged attention mask."""
    rh.install()
    import torch

    from lightx2v.models.input_encoders.hf.t5.model import T5Encoder

    from lightx2v_tpu.encoders.t5 import init_random_t5_state_dict, load_t5_params, t5_encode

    cfg = t5_cfg(shared_pos)
    sd = init_random_t5_state_dict(cfg, seed=9, scale=0.05)

    ref = T5Encoder(dtype=torch.bfloat16, vocab=cfg.vocab_size, dim=cfg.dim,
                    dim_attn=cfg.dim_attn, dim_ffn=cfg.dim_ffn,
                    num_heads=cfg.num_heads, num_layers=cfg.num_layers,
                    num_buckets=cfg.num_buckets, shared_pos=shared_pos).eval()
    # T5RelativeEmbedding hardcodes max_dist=128; the tiny config must agree
    for m in ref.modules():
        if hasattr(m, "max_dist"):
            m.max_dist = cfg.max_dist
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)).to(torch.bfloat16) for k, v in sd.items()}, strict=True)

    rng = np.random.default_rng(31)
    B, L = 2, 12
    ids = rng.integers(1, cfg.vocab_size, size=(B, L))
    lens = np.array([12, 7])
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids), torch.from_numpy(mask)).float().numpy()

    import jax.numpy as jnp

    params = load_t5_params(sd, cfg)
    got = np.asarray(t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg), np.float32)

    # compare valid rows only (ours zeroes padded rows; the reference
    # leaves them as garbage attended-from-nothing values)
    for b in range(B):
        s = snr_db(ref_out[b, : lens[b]], got[b, : lens[b]])
        assert s > 25.0, f"T5(shared_pos={shared_pos}) row {b} SNR = {s:.1f} dB"


def test_t5_relative_buckets_match_reference():
    """The log-bucketing integer math (reference model.py:255-281) must be
    bit-identical — it indexes an embedding table."""
    rh.install()
    import torch

    from lightx2v.models.input_encoders.hf.t5.model import T5RelativeEmbedding

    from lightx2v_tpu.encoders.t5 import relative_position_buckets

    for L, nb, md in ((12, 8, 16), (32, 32, 128), (64, 32, 128)):
        ref_emb = T5RelativeEmbedding(nb, 1, bidirectional=True)
        ref_emb.max_dist = md
        rel = torch.arange(L).unsqueeze(0) - torch.arange(L).unsqueeze(1)
        ref_buckets = ref_emb._relative_position_bucket(rel).numpy()
        got = relative_position_buckets(L, L, nb, md)
        np.testing.assert_array_equal(got, ref_buckets)


# ------------------------------------------------------------------ CLIP ViT


def test_clip_vision_matches_reference():
    """Tiny ViT vision tower (reference xlm_roberta/model.py:212-295) with
    Wan's use_31_block slicing analog (all-but-last block)."""
    rh.install()
    import torch

    from lightx2v.models.input_encoders.hf.xlm_roberta.model import VisionTransformer

    from lightx2v_tpu.encoders.clip import (
        ClipVisionArch, clip_vision_forward, init_random_clip_state_dict,
        load_clip_vision_params)

    arch = ClipVisionArch(image_size=16, patch_size=8, dim=32, mlp_ratio=2,
                          num_heads=2, num_layers=3, use_blocks=2)
    sd = init_random_clip_state_dict(arch, seed=13, scale=0.05)

    ref = VisionTransformer(
        dtype=torch.bfloat16, image_size=arch.image_size, patch_size=arch.patch_size,
        dim=arch.dim, mlp_ratio=arch.mlp_ratio, out_dim=24, num_heads=arch.num_heads,
        num_layers=arch.num_layers, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", norm_eps=arch.norm_eps).eval()
    # LN params stay fp32: the reference's LayerNorm computes in fp32
    # (model.py:46-48 x.float()) — CUDA allows bf16 params there, CPU does
    # not; fp32 params are the identical math
    tsd = {k[len("visual."):]: torch.from_numpy(np.asarray(v)).to(
               torch.float32 if "norm" in k else torch.bfloat16)
           for k, v in sd.items()}
    # reference always creates post_norm + head even though the Wan
    # use_31_block path never evaluates them; provide identity for strictness
    tsd["post_norm.weight"] = torch.ones(arch.dim)
    tsd["post_norm.bias"] = torch.zeros(arch.dim)
    tsd["head"] = torch.zeros(arch.dim, 24, dtype=torch.bfloat16)
    ref.load_state_dict(tsd, strict=True)
    for m in ref.modules():
        if isinstance(m, torch.nn.LayerNorm):
            m.float()

    rng = np.random.default_rng(41)
    img = rng.standard_normal((2, 3, arch.image_size, arch.image_size)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(img).to(torch.bfloat16), use_31_block=True).float().numpy()

    import jax.numpy as jnp

    params = load_clip_vision_params(sd, arch)
    got = np.asarray(
        clip_vision_forward(params, jnp.asarray(img.transpose(0, 2, 3, 1)), arch),
        np.float32)
    assert got.shape == ref_out.shape
    s = snr_db(ref_out, got)
    assert s > 25.0, f"CLIP vision tower SNR vs reference = {s:.1f} dB"
