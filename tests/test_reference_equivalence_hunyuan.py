"""Hunyuan MMDiT equivalence against the REFERENCE implementation.

Runs the reference's own HunyuanPreInfer / HunyuanTransformerInfer /
HunyuanPostInfer (lightx2v/models/networks/hunyuan/infer/*) on CPU at a
tiny arch (sizes are instance-attribute overrides; all compute is
reference code) with the SAME synthetic state dict our loader consumes,
and asserts the TPU stack reproduces:

* the rope table convention (reference get_nd_rotary_pos_embed,
  schedulers/hunyuan/scheduler.py:111-180, vs our build_hunyuan_rope)
* the full t2v forward (double+single blocks, guidance embedding)
* the i2v token_replace forward (first-frame tokens modulated at t=0)
* two-sided state-dict key coverage (reference classes request exactly
  the keys our synthetic checkpoint provides).
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


F, H, W = 3, 8, 8  # latent sizes; tokens = F * H/2 * W/2 = 48
LT = 7


def tiny_arch(task="t2v"):
    from lightx2v_tpu.models.hunyuan.config import HunyuanArch

    return HunyuanArch(
        hidden_size=64, heads_num=2, double_blocks=2, single_blocks=2,
        mlp_hidden_dim=128, in_channels=16, out_channels=16,
        patch_size=(1, 2, 2), text_states_dim=48, text_states_dim_2=24,
        rope_dim_list=(8, 12, 12), rope_theta=256.0, guidance_embed=True,
        task=task,
    )


@pytest.fixture(scope="module")
def tiny_sd():
    from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_state_dict

    return init_random_hunyuan_state_dict(tiny_arch(), seed=3, scale=0.05)


def _inputs(seed=11):
    rng = np.random.default_rng(seed)
    text = rng.standard_normal((1, LT, 48), dtype=np.float32) * 0.5
    mask = np.ones((1, LT), dtype=np.int64)
    text2 = rng.standard_normal((1, 24), dtype=np.float32) * 0.5
    lat = rng.standard_normal((1, 16, F, H, W), dtype=np.float32)
    return text, mask, text2, lat


def _run_reference(task, sd_np):
    rh.install()
    import torch

    arch = tiny_arch(task)
    cfg = rh.tiny_hunyuan_cfg(task)
    sd = rh.RecordingDict(rh.to_torch_sd(sd_np))
    (pre_w, tr_w, post_w), (pre_i, tr_i, post_i) = rh.build_reference_hunyuan(cfg, sd, arch)

    text, mask, text2, lat = _inputs()
    fc, fs = rh.reference_hunyuan_rope(arch, F, H // 2, W // 2)

    class _Sched:
        pass

    sched = _Sched()
    sched.latents = torch.from_numpy(lat).to(torch.bfloat16)
    sched.timesteps = torch.tensor([960.0])
    sched.step_index = 0
    sched.freqs_cos = fc.to(torch.bfloat16)
    sched.freqs_sin = fs.to(torch.bfloat16)
    sched.guidance = torch.tensor([6000.0], dtype=torch.bfloat16)
    pre_i.set_scheduler(sched)
    tr_i.set_scheduler(sched)
    post_i.set_scheduler(sched)

    inputs = {
        "text_encoder_output": {
            "text_encoder_1_text_states": torch.from_numpy(text).to(torch.bfloat16),
            "text_encoder_1_attention_mask": torch.from_numpy(mask),
            "text_encoder_2_text_states": torch.from_numpy(text2).to(torch.bfloat16),
        }
    }
    with torch.no_grad():
        pre_out = pre_i.infer(pre_w, inputs)
        img, vec = tr_i.infer(tr_w, *pre_out)
        out = post_i.infer(post_w, img, vec)
    return out.float().numpy(), sd


def _run_ours(task):
    import jax.numpy as jnp

    from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward
    from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_state_dict, load_hunyuan_params

    arch = tiny_arch(task)
    sd = init_random_hunyuan_state_dict(arch, seed=3, scale=0.05)
    params = load_hunyuan_params(sd, arch)
    text, mask, text2, lat = _inputs()
    cos, sin = build_hunyuan_rope(arch, F, H // 2, W // 2)
    out = hunyuan_forward(
        params, jnp.asarray(lat).astype(jnp.bfloat16), jnp.asarray([960.0]),
        jnp.asarray(text), jnp.asarray(mask), jnp.asarray(text2),
        jnp.asarray(cos), jnp.asarray(sin), arch,
        guidance=jnp.asarray([6000.0]), attn_type="xla",
        token_replace=(task == "i2v"),
    )
    return np.asarray(out, np.float32)


def test_rope_matches_reference():
    """Our (S, d/2) pair-form tables == the reference's repeat-interleaved
    (S, d) tables (scheduler.py:18-109 convention)."""
    arch = tiny_arch()
    fc, fs = rh.reference_hunyuan_rope(arch, F, H // 2, W // 2)
    from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope

    cos, sin = build_hunyuan_rope(arch, F, H // 2, W // 2)
    np.testing.assert_allclose(np.repeat(cos, 2, axis=1), fc.float().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.repeat(sin, 2, axis=1), fs.float().numpy(), atol=1e-5)


# Bar note: the reference rounds its rope tables to bf16 before applying
# them (scheduler.py:318-319/361-362) while ours stay fp32 (strictly more
# precise); with everything else identical that rounding alone bounds
# agreement near ~28 dB. The table *convention* is pinned exactly by
# test_rope_matches_reference, so 25 dB here is the bf16-noise bar, not
# slack for a logic divergence.
def test_t2v_forward_matches_reference(tiny_sd):
    ref, _ = _run_reference("t2v", tiny_sd)
    got = _run_ours("t2v")
    assert got.shape == ref.shape
    s = snr_db(ref, got)
    assert s > 25.0, f"hunyuan t2v forward SNR vs reference = {s:.1f} dB"


def test_i2v_token_replace_matches_reference(tiny_sd):
    ref, _ = _run_reference("i2v", tiny_sd)
    got = _run_ours("i2v")
    s = snr_db(ref, got)
    assert s > 25.0, f"hunyuan i2v forward SNR vs reference = {s:.1f} dB"


def test_state_dict_key_coverage(tiny_sd):
    """Every key the reference weight classes request exists in our
    synthetic checkpoint AND our checkpoint has no keys the reference
    never consumes (two-sided layout equivalence)."""
    _, sd = _run_reference("t2v", tiny_sd)
    assert sd.requested == set(tiny_sd.keys()), (
        f"missing from ours: {sorted(sd.requested - set(tiny_sd))[:5]}; "
        f"extra in ours: {sorted(set(tiny_sd) - sd.requested)[:5]}")
