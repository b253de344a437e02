"""Audio adapter equivalence against the REFERENCE.

Instantiates the reference's own ``AudioAdapter`` (lightx2v/models/
networks/wan/audio_adapter.py:216-333: AudioProjection + TimeEmbedding +
per-block PerceiverAttentionCA with adaLN gating) at a tiny arch on CPU,
randomizes its state dict (strict load = two-sided key coverage), runs
its block-injection ``modify_func`` closure, and pins our
``audio_projection`` / ``audio_time_embedding`` / ``perceiver_ca``
composition — wired exactly as ``runners/wan_audio_runner.py`` wires it —
against the result.

The reference's flash_attn varlen call is served by the harness's
public-API SDPA stand-in (per-frame segments); every other line executed
is the reference's own. ``projection_transformer_layers=0`` selects the
reference's MLP-only AudioProjection path, matching the rebuild's
documented divergence (the optional transformer-decoder refiner).
"""

from __future__ import annotations

import numpy as np
import pytest

import reference_harness as rh

pytestmark = pytest.mark.skipif(not rh.reference_available(), reason="/root/reference not present")

DIM = 64          # attention_head_dim * heads
HEADS = 4
LAYERS = 3
FEAT_DIM = 32     # audio_feature_dim
NUM_TOKENS = 4
MLP_DIMS = (48, 48, NUM_TOKENS * FEAT_DIM)
TIME_FREQ = 32
LATENT_F = 3      # latent frames
TOK_PER_FRAME = 6  # h*w tokens per latent frame


def snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = np.square(ref - got).sum()
    return np.inf if err == 0 else 10.0 * np.log10(np.square(ref).sum() / err)


@pytest.fixture(scope="module")
def ref_and_ours():
    rh.install()
    import torch

    from lightx2v.models.networks.wan.audio_adapter import AudioAdapter

    from lightx2v_tpu.models.wan.audio_adapter import load_audio_adapter

    ref = AudioAdapter(
        attention_head_dim=DIM // HEADS,
        num_attention_heads=HEADS,
        base_num_layers=LAYERS,
        interval=1,
        audio_feature_dim=FEAT_DIM,
        num_tokens=NUM_TOKENS,
        mlp_dims=MLP_DIMS,
        time_freq_dim=TIME_FREQ,
        projection_transformer_layers=0,
    )
    g = torch.Generator().manual_seed(23)
    sd = {k: torch.randn(v.shape, generator=g) * 0.1 for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    params = load_audio_adapter({k: v.numpy() for k, v in sd.items()},
                                interval=1, heads=HEADS)
    return ref, params


def _audio_feat(seed=51):
    # already at video_frame length ((LATENT_F-1)*4+1): the reference's
    # linear_interpolation to the same length is exactly identity
    video_frames = (LATENT_F - 1) * 4 + 1
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, video_frames, FEAT_DIM)).astype(np.float32)


def test_time_embedding_matches_reference(ref_and_ours):
    import torch

    from lightx2v_tpu.models.wan.audio_adapter import audio_time_embedding

    ref, params = ref_and_ours
    t = np.array([435.0], np.float32)
    with torch.no_grad():
        want = ref.time_embedding(torch.from_numpy(t)).unflatten(1, (3, -1)).numpy()
    got = np.asarray(audio_time_embedding(params["time_embedding"],
                                          np.asarray(t), freq_dim=TIME_FREQ))
    s = snr_db(want, got)
    assert s > 40.0, f"time embedding SNR {s:.1f} dB"


def test_audio_projection_matches_reference(ref_and_ours):
    import torch

    from lightx2v_tpu.models.wan.audio_adapter import audio_projection

    ref, params = ref_and_ours
    feat = _audio_feat()
    with torch.no_grad():
        x = ref.audio_proj(torch.from_numpy(feat), LATENT_F)
        x = ref.rearange_audio_features(x)
        want = (x + ref.audio_pe).numpy()  # forward():313-315
    got = np.asarray(audio_projection(params["proj"], np.asarray(feat), LATENT_F,
                                      num_tokens=NUM_TOKENS), np.float32)
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 30.0, f"audio projection SNR {s:.1f} dB (bf16 mlp vs fp32 ref)"


def test_block_injection_matches_reference(ref_and_ours):
    """Full per-block injection: reference modify_func vs our
    audio_projection + perceiver_ca residual (wan_audio_runner.py wiring),
    including a pad tail that must stay untouched."""
    import torch

    from lightx2v_tpu.models.wan.audio_adapter import (
        audio_projection, audio_time_embedding, perceiver_ca)

    ref, params = ref_and_ours
    feat = _audio_feat()
    t = np.array([217.0], np.float32)
    weight = 0.75
    n_tokens = LATENT_F * TOK_PER_FRAME
    tail = 4  # sp-style pad tokens after the video tokens
    rng = np.random.default_rng(77)
    hidden = rng.standard_normal((1, n_tokens + tail, DIM)).astype(np.float32)
    grid_sizes = torch.tensor([[LATENT_F, 2, 3]])  # t*h*w = n_tokens

    with torch.no_grad():
        ret = ref(torch.from_numpy(feat), torch.from_numpy(t), LATENT_F, weight=weight)
        for block_idx in (0, LAYERS - 1):
            kw = ret[block_idx]["kwargs"]
            # the reference squeezes the batch dim on return (bs=1 assumption,
            # audio_adapter.py:308-309)
            want = ret[block_idx]["modify_func"](
                torch.from_numpy(hidden.copy()), grid_sizes, **kw).numpy()[None]

            audio_tokens = audio_projection(params["proj"], np.asarray(feat),
                                            LATENT_F, num_tokens=NUM_TOKENS)
            t_emb = audio_time_embedding(params["time_embedding"], np.asarray(t),
                                         freq_dim=TIME_FREQ)
            import jax.tree_util as jtu

            ca_p = jtu.tree_map(lambda a: a[block_idx], params["ca_blocks"])
            lat_grouped = hidden[:, :n_tokens].reshape(1, LATENT_F, TOK_PER_FRAME, DIM)
            delta = np.asarray(perceiver_ca(ca_p, audio_tokens, lat_grouped,
                                            t_emb, heads=HEADS), np.float32)
            got = hidden.copy()
            got[:, :n_tokens] += weight * delta.reshape(1, n_tokens, DIM)

            assert want.shape == got.shape
            # the pad tail is outside the injection on both sides
            np.testing.assert_array_equal(want[:, n_tokens:], hidden[:, n_tokens:])
            s = snr_db(want, got)
            assert s > 30.0, f"block {block_idx} injection SNR {s:.1f} dB"
