"""UMT5 encoder: fp64 torch oracle parity on a tiny config."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightx2v_tpu.encoders.t5 import (
    T5Config,
    init_random_t5_state_dict,
    load_t5_params,
    relative_position_buckets,
    t5_encode,
)

TINY = T5Config(vocab_size=100, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
                num_layers=2, num_buckets=8, max_dist=16)


def torch_t5_encode(sd, cfg: T5Config, ids, mask):
    td = {k: torch.from_numpy(np.asarray(v, np.float64)) for k, v in sd.items()}
    x = td["token_embedding.weight"][torch.from_numpy(ids)]
    n, hd = cfg.num_heads, cfg.dim_attn // cfg.num_heads
    b, L, _ = x.shape
    buckets = torch.from_numpy(relative_position_buckets(L, L, cfg.num_buckets, cfg.max_dist))
    maskt = torch.from_numpy(mask)
    norm = lambda w, v: w * (v * torch.rsqrt((v**2).mean(-1, keepdim=True) + 1e-6))
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        h = norm(td[f"{p}.norm1.weight"], x)
        q = (h @ td[f"{p}.attn.q.weight"].T).view(b, L, n, hd)
        k = (h @ td[f"{p}.attn.k.weight"].T).view(b, L, n, hd)
        v = (h @ td[f"{p}.attn.v.weight"].T).view(b, L, n, hd)
        bias = td[f"{p}.pos_embedding.embedding.weight"][buckets].permute(2, 0, 1).unsqueeze(0)
        logits = torch.einsum("bqnc,bknc->bnqk", q, k) + bias
        logits = logits.masked_fill(maskt.view(b, 1, 1, L) == 0, float("-inf"))
        attn = torch.softmax(logits, dim=-1)
        out = torch.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, L, cfg.dim_attn)
        x = x + out @ td[f"{p}.attn.o.weight"].T
        h = norm(td[f"{p}.norm2.weight"], x)
        gate = F.gelu(h @ td[f"{p}.ffn.gate.0.weight"].T, approximate="tanh")
        y = (h @ td[f"{p}.ffn.fc1.weight"].T) * gate
        x = x + y @ td[f"{p}.ffn.fc2.weight"].T
    x = norm(td["norm.weight"], x)
    x = x * (maskt.unsqueeze(-1) > 0)
    return x.numpy()


def test_bucket_table_symmetries():
    b = relative_position_buckets(8, 8, num_buckets=8, max_dist=16)
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    # forward and backward offsets land in different halves
    assert b[0, 1] != b[1, 0]


def test_oracle_parity():
    sd = init_random_t5_state_dict(TINY, seed=0, scale=0.1)
    params = load_t5_params(sd, TINY, dtype=np.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0
    out = t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), TINY)
    ref = torch_t5_encode(sd, TINY, ids, mask)
    got = np.asarray(out, np.float32)
    assert got.shape == ref.shape
    # bf16 activations: compare correlation + moderate tolerance
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.9999, f"correlation {c}"
    np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.05)
    # padded rows exactly zero
    assert np.all(got[1, 6:] == 0)


def test_shared_pos_variant():
    """T5 v1.1 (CogVideoX encoder) shares one relative-bias table."""
    cfg = T5Config(vocab_size=50, dim=16, dim_attn=16, dim_ffn=24, num_heads=2,
                   num_layers=2, num_buckets=8, max_dist=16, shared_pos=True)
    sd = init_random_t5_state_dict(cfg, seed=0, scale=0.1)
    assert "pos_embedding.embedding.weight" in sd
    assert "blocks.0.pos_embedding.embedding.weight" not in sd
    params = load_t5_params(sd, cfg, dtype=np.float32)
    ids = np.arange(8)[None] % 50
    mask = np.ones((1, 8), np.int32)
    out = t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_quantized_t5_matches_dense():
    """int8-quantized encoder linears (reference q_linear.py) vs dense."""
    from lightx2v_tpu.encoders.t5 import quantize_t5_params

    sd = init_random_t5_state_dict(TINY, seed=0, scale=0.1)
    params = load_t5_params(sd, TINY, dtype=np.float32)
    qparams = quantize_t5_params(params, "int8")
    ids = np.random.default_rng(1).integers(0, TINY.vocab_size, (1, 12))
    mask = np.ones((1, 12), np.int32)
    ref = np.asarray(t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), TINY), np.float32)
    out = np.asarray(t5_encode(qparams, jnp.asarray(ids), jnp.asarray(mask), TINY), np.float32)
    snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
    assert snr < 1e-2, f"snr {snr}"


def test_on_device_synth_layout_matches_loader():
    """init_random_t5_params_on_device must emit the exact pytree layout of
    load_t5_params (bf16) / quantize_t5_params (int8) — the bench's e2e
    encode stage (BENCH_INCLUDE_ENCODE=1) runs t5_encode on it directly."""
    import jax
    from lightx2v_tpu.encoders.t5 import (init_random_t5_params_on_device,
                                          quantize_t5_params)

    sd = init_random_t5_state_dict(TINY, seed=0, scale=0.1)
    loaded = load_t5_params(sd, TINY, dtype=np.float32)

    for scheme, ref_tree in (("bf16", loaded),
                             ("int8", quantize_t5_params(loaded, "int8"))):
        synth = init_random_t5_params_on_device(TINY, scheme=scheme, seed=3)
        ref_s = jax.tree_util.tree_structure(ref_tree)
        got_s = jax.tree_util.tree_structure(synth)
        assert ref_s == got_s, f"{scheme}: {got_s} != {ref_s}"
        for rp, gp in zip(jax.tree_util.tree_leaves(ref_tree),
                          jax.tree_util.tree_leaves(synth)):
            assert rp.shape == gp.shape, (scheme, rp.shape, gp.shape)

        ids = np.random.default_rng(2).integers(0, TINY.vocab_size, (1, 9))
        mask = np.ones((1, 9), np.int32)
        out = t5_encode(synth, jnp.asarray(ids), jnp.asarray(mask), TINY)
        assert out.shape == (1, 9, TINY.dim)
        assert np.isfinite(np.asarray(out, np.float32)).all()
