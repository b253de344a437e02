"""Oracle tests for the JAX-native Llama and CLIP-text encoders against
executing HF transformers models (tiny configs, real code path).

Reference semantics pinned:
* Llama (reference llama/model.py:14-63): hidden_states[-(skip+1)] with
  skip=2 — i.e. run num_layers-skip blocks, NO final norm — then crop
  the first crop_start template tokens from hidden AND mask.
* CLIP text (reference clip/model.py:26-50): pooler_output at the eot
  (max-id) token after the final LayerNorm.

These are the TPU-resident encode stages for the protocol-complete
Hunyuan e2e (the torch-CPU wrappers in encoders/hf_text.py remain the
real-checkpoint path; these JAX towers take the same HF state_dicts).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def snr_db(ref, got):
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    err = float(np.mean((ref - got) ** 2))
    return 10.0 * np.log10(float(np.mean(ref**2)) / max(err, 1e-30))


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaModel

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      rope_theta=10000.0, rms_norm_eps=1e-5)
    model = LlamaModel(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def tiny_clip_text():
    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(1)
    # eos = the vocabulary's highest id, as in real CLIP-L (eot 49407):
    # HF pools at the first eos position, our tower at the first argmax —
    # identical exactly when eos is the max id (the deployed case)
    cfg = CLIPTextConfig(vocab_size=64, hidden_size=24, intermediate_size=48,
                         num_hidden_layers=3, num_attention_heads=4,
                         max_position_embeddings=77, eos_token_id=63)
    model = CLIPTextModel(cfg).eval()
    return cfg, model


def _llama_arch(cfg, skip=2, crop=3):
    from lightx2v_tpu.encoders.llama import LlamaArch

    return LlamaArch(vocab_size=cfg.vocab_size, dim=cfg.hidden_size,
                     num_layers=cfg.num_hidden_layers,
                     num_heads=cfg.num_attention_heads,
                     num_kv_heads=cfg.num_key_value_heads,
                     ffn_dim=cfg.intermediate_size, rope_theta=cfg.rope_theta,
                     rms_eps=cfg.rms_norm_eps, hidden_state_skip_layer=skip,
                     crop_start=crop)


def test_llama_matches_hf_hidden_states(tiny_llama):
    """Our scan over num_layers-skip blocks == HF hidden_states[-(skip+1)],
    including GQA (2 kv heads broadcast over 4 q heads) and right-padding."""
    from lightx2v_tpu.encoders.llama import llama_encode, load_llama_params

    cfg, model = tiny_llama
    arch = _llama_arch(cfg, skip=2)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (2, 12))
    ids[1, 9:] = 0  # right padding
    mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                    output_hidden_states=True)
    ref = out.hidden_states[-(2 + 1)].numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_llama_params(sd, arch, dtype=np.float32)
    got = np.asarray(llama_encode(params, ids, mask, arch), np.float32)

    # padded rows diverge (HF masks them differently); compare valid rows
    for b in range(2):
        n = int(mask[b].sum())
        s = snr_db(ref[b, :n], got[b, :n])
        assert s > 30.0, f"row {b}: SNR {s:.1f} dB"


def test_llama_crop_contract(tiny_llama):
    from lightx2v_tpu.encoders.llama import (llama_encode,
                                             llama_encode_cropped,
                                             load_llama_params)

    cfg, model = tiny_llama
    arch = _llama_arch(cfg, skip=2, crop=3)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_llama_params(sd, arch)
    ids = np.arange(1, 11)[None] % cfg.vocab_size
    mask = np.ones_like(ids)
    full = np.asarray(llama_encode(params, ids, mask, arch), np.float32)
    hid, m = llama_encode_cropped(params, ids, mask, arch)
    assert hid.shape == (1, 7, cfg.hidden_size)
    assert m.shape == (1, 7)
    np.testing.assert_allclose(np.asarray(hid, np.float32), full[:, 3:], rtol=0, atol=0)


def test_llama_quantized_runs(tiny_llama):
    from lightx2v_tpu.encoders.llama import (llama_encode, load_llama_params,
                                             quantize_llama_params)

    cfg, model = tiny_llama
    arch = _llama_arch(cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_llama_params(sd, arch, dtype=np.float32)
    ref = np.asarray(llama_encode(params, np.arange(1, 9)[None], np.ones((1, 8), np.int64), arch), np.float32)
    qp = quantize_llama_params(params, "int8")
    got = np.asarray(llama_encode(qp, np.arange(1, 9)[None], np.ones((1, 8), np.int64), arch), np.float32)
    assert np.isfinite(got).all()
    assert snr_db(ref, got) > 15.0  # int8 weight-only on a tiny model


def test_llama_synth_layout_matches_loader(tiny_llama):
    """Device-synth pytree must mirror the loader layout exactly (same
    guarantee the T5/DiT synths are tested for)."""
    import jax

    from lightx2v_tpu.encoders.llama import (init_random_llama_params_on_device,
                                             llama_encode, load_llama_params)

    cfg, model = tiny_llama
    arch = _llama_arch(cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ref = load_llama_params(sd, arch)
    for scheme in ("bf16", "int8"):
        got = init_random_llama_params_on_device(arch, scheme=scheme, seed=0)
        if scheme == "bf16":
            rs = jax.tree_util.tree_structure(ref)
            gs = jax.tree_util.tree_structure(got)
            assert rs == gs, f"{rs} != {gs}"
            for r, g in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
                assert r.shape == g.shape, (r.shape, g.shape)
        else:
            assert got["blocks"]["q"]["w"].dtype == np.int8

    # w4a8: nibble-packed uint8 weights at HALF the int8 footprint (the
    # Hunyuan protocol-e2e coexistence lever) — encode must stay finite
    # through the int4 mm path
    got = init_random_llama_params_on_device(arch, scheme="w4a8", seed=0)
    q = got["blocks"]["q"]
    assert q["w"].dtype == np.uint8
    assert q["w"].shape == (arch.num_layers, arch.dim, arch.dim // 2)
    out = llama_encode(got, np.arange(1, 9)[None], np.ones((1, 8), np.int64), arch)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_clip_text_matches_hf(tiny_clip_text):
    from lightx2v_tpu.encoders.clip import (ClipTextArch, clip_text_forward,
                                            load_clip_text_params)

    cfg, model = tiny_clip_text
    arch = ClipTextArch(vocab_size=cfg.vocab_size, dim=cfg.hidden_size,
                        mlp_ratio=cfg.intermediate_size // cfg.hidden_size,
                        num_heads=cfg.num_attention_heads,
                        num_layers=cfg.num_hidden_layers,
                        max_positions=cfg.max_position_embeddings)
    rng = np.random.default_rng(3)
    # eot = highest id present, once per row (argmax-pooling contract);
    # HF CLIPTextModel pools at the eos_token_id position
    ids = rng.integers(1, cfg.vocab_size - 1, (2, 10))
    ids[:, 6] = cfg.vocab_size - 1
    ids[:, 7:] = 0
    mask = (ids != 0).astype(np.int64)
    mask[:, :7] = 1

    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_clip_text_params(sd, arch, dtype=np.float32)
    hid, pooled = clip_text_forward(params, ids, mask, arch)

    n = 7
    s_h = snr_db(ref_hidden[:, :n], np.asarray(hid, np.float32)[:, :n])
    s_p = snr_db(ref_pooled, np.asarray(pooled, np.float32))
    assert s_h > 30.0, f"hidden SNR {s_h:.1f} dB"
    assert s_p > 30.0, f"pooled SNR {s_p:.1f} dB"


def test_clip_text_synth_runs():
    from lightx2v_tpu.encoders.clip import (ClipTextArch, clip_text_forward,
                                            init_random_clip_text_params_on_device)

    arch = ClipTextArch(vocab_size=48, dim=16, num_heads=4, num_layers=2,
                        max_positions=16)
    params = init_random_clip_text_params_on_device(arch, seed=0)
    ids = np.arange(1, 9)[None] % 48
    mask = np.ones_like(ids)
    hid, pooled = clip_text_forward(params, ids, mask, arch)
    assert hid.shape == (1, 8, 16) and pooled.shape == (1, 16)
    assert np.isfinite(np.asarray(pooled, np.float32)).all()
