import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.ops import attention as attn
from lightx2v_tpu.ops import norms
from lightx2v_tpu.ops.linear import (
    mm_default,
    mm_fp32,
    quantize_per_token_int8,
    resolve_mm,
)
from lightx2v_tpu.ops.rope import (
    apply_rope,
    build_wan_rope_grid,
    guidance_scale_embedding,
    rope_params_1d,
    sinusoidal_embedding_1d,
)


def rand(*shape, key=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


class TestNorms:
    def test_rms_norm_matches_numpy(self):
        x = rand(4, 16)
        w = rand(16, key=1) * 0.1 + 1.0
        out = norms.rms_norm(x, w, eps=1e-6)
        xn = np.asarray(x, np.float64)
        expected = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w, np.float64)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_rms_norm_bf16_scale_rounding_bounded(self):
        """The bf16 input path applies inv-rms and weight in bf16 (keeps
        the fp32 intermediate out of HBM — see rms_norm docstring). Pin
        the cost of that double rounding: > 40 dB SNR vs the fp32-multiply
        oracle, i.e. well under the bf16 noise the attention consumes."""
        x = rand(64, 128, key=3, dtype=jnp.bfloat16)
        w = rand(128, key=4) * 0.1 + 1.0
        out = np.asarray(norms.rms_norm(x, w, eps=1e-6), np.float64)
        xf = np.asarray(x, np.float64)
        ref = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w, np.float64)
        snr = 10 * np.log10((ref**2).sum() / ((ref - out) ** 2).sum())
        assert snr > 40.0, f"bf16 rms_norm SNR {snr:.1f} dB"

    def test_layer_norm_no_affine(self):
        x = rand(3, 8)
        out = norms.layer_norm(x, eps=1e-6)
        xn = np.asarray(x, np.float64)
        mu, var = xn.mean(-1, keepdims=True), xn.var(-1, keepdims=True)
        np.testing.assert_allclose(out, (xn - mu) / np.sqrt(var + 1e-6), rtol=1e-4, atol=1e-5)

    def test_modulated_layer_norm_equivalence(self):
        x = rand(2, 5, 8)
        shift = rand(2, 1, 8, key=1)
        scale = rand(2, 1, 8, key=2)
        out = norms.modulated_layer_norm(x, shift, scale)
        base = norms.layer_norm(x)
        np.testing.assert_allclose(out, np.asarray(base) * (1 + np.asarray(scale)) + np.asarray(shift), rtol=1e-4, atol=1e-5)


class TestLinear:
    def test_mm_default(self):
        # w keeps the torch Linear (out, in) layout
        x = rand(5, 8)
        w = rand(12, 8, key=1)
        b = rand(12, key=2)
        out = mm_default({"w": w, "b": b}, x)
        np.testing.assert_allclose(out, np.asarray(x) @ np.asarray(w).T + np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_mm_fp32_from_bf16_input(self):
        x = rand(5, 8).astype(jnp.bfloat16)
        w = rand(12, 8, key=1)
        out = mm_fp32({"w": w, "b": None}, x)
        assert out.dtype == jnp.float32

    def test_int8_quant_roundtrip(self):
        x = rand(7, 33)
        q, s = quantize_per_token_int8(x)
        deq = q.astype(jnp.float32) * s
        np.testing.assert_allclose(deq, x, atol=np.abs(np.asarray(x)).max() / 127 * 1.01)

    @pytest.mark.parametrize(
        "mm_type",
        [
            "W-int8-channel-sym-A-int8-channel-sym-dynamic-Vllm",
            "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Sgl",
        ],
    )
    def test_quant_mm_accuracy(self, mm_type):
        """Quant GEMM rel-error < 1e-2 vs fp GEMM — the reference's kernel
        accuracy bar (lightx2v_kernel/test/mxfp8_mxfp8/test_mxfp8_quant.py:37)."""
        x = rand(64, 128).astype(jnp.bfloat16)
        w = rand(96, 128, key=1) * 0.05  # (out, in)
        b = rand(96, key=2) * 0.01
        ref = np.asarray(mm_default({"w": w, "b": b}, x), np.float32)
        # per-output-channel symmetric weight quant
        if "int8" in mm_type:
            ws = np.abs(np.asarray(w)).max(1) / 127.0
            wq = jnp.asarray(np.clip(np.round(np.asarray(w) / ws[:, None]), -127, 127).astype(np.int8))
        else:
            ws = np.abs(np.asarray(w)).max(1) / 448.0
            wq = (jnp.asarray(w) / jnp.asarray(ws)[:, None]).astype(jnp.float8_e4m3fn)
        fn = resolve_mm(mm_type)
        out = np.asarray(fn({"w": wq, "w_scale": jnp.asarray(ws), "b": b}, x), np.float32)
        # SNR-style relative squared error, as in the reference's
        # lightx2v_kernel/python/lightx2v_kernel/utils.py:38 error()
        snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
        assert snr < 1e-2, f"rel sq error {snr}"


class TestRope:
    def test_rope_params_match_torch_formula(self):
        import torch

        dim, L = 32, 64
        ours = rope_params_1d(L, dim)
        freqs = torch.outer(
            torch.arange(L),
            1.0 / torch.pow(10000, torch.arange(0, dim, 2).to(torch.float64).div(dim)),
        )
        np.testing.assert_allclose(ours, freqs.numpy(), rtol=1e-6)

    def test_apply_rope_matches_complex_reference(self):
        """Pair-form rotation == fp64 complex multiply (reference:
        wan/infer/utils.py:107-115)."""
        import torch

        S, N, D = 12, 2, 16
        x = np.random.default_rng(0).standard_normal((1, S, N, D)).astype(np.float32)
        cos, sin = build_wan_rope_grid(D, 3, 2, 2)
        out = apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin))

        xt = torch.from_numpy(x[0]).to(torch.float64)
        angles = torch.from_numpy(np.arctan2(sin, cos)).to(torch.float64)
        freqs_i = torch.polar(torch.ones_like(angles), angles).unsqueeze(1)  # (S,1,D/2)
        xc = torch.view_as_complex(xt.reshape(S, N, D // 2, 2))
        expected = torch.view_as_real(xc * freqs_i).flatten(2).numpy()
        np.testing.assert_allclose(np.asarray(out)[0], expected, rtol=1e-4, atol=1e-5)

    def test_rope_grid_shapes_and_split(self):
        D = 128  # wan head_dim
        f, h, w = 4, 3, 5
        cos, sin = build_wan_rope_grid(D, f, h, w)
        assert cos.shape == (f * h * w, D // 2)
        # temporal component: first token of each frame differs across frames
        ct = D // 2 - 2 * ((D // 2) // 3)
        assert not np.allclose(cos[0, :ct], cos[h * w, :ct])
        # spatial-w component varies within a row (first w-axis element has
        # inv-freq 1.0, so sin(angle) = sin(w_pos))
        w_start = D // 2 - (D // 2) // 3
        assert not np.allclose(sin[0, w_start], sin[1, w_start])

    def test_sinusoidal_embedding(self):
        import torch

        emb = sinusoidal_embedding_1d(16, jnp.asarray([0.0, 500.0]))
        pos = torch.tensor([0.0, 500.0], dtype=torch.float64)
        sinusoid = torch.outer(pos, torch.pow(10000, -torch.arange(8).to(pos).div(8)))
        expected = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).numpy()
        # fp32 trig argument reduction at position~1000 costs ~4e-4 abs vs the
        # reference's fp64; far below bf16 activation resolution (~8e-3). The
        # denoise loop additionally precomputes these tables host-side in fp64.
        np.testing.assert_allclose(emb, expected, rtol=1e-3, atol=1e-3)

    def test_guidance_scale_embedding_shape(self):
        emb = guidance_scale_embedding(jnp.asarray([4.0]), 256)
        assert emb.shape == (1, 256)


class TestAttention:
    def test_chunked_matches_full(self):
        q = rand(2, 100, 3, 16, key=1) * 0.5
        k = rand(2, 120, 3, 16, key=2) * 0.5
        v = rand(2, 120, 3, 16, key=3)
        full = attn.attn_xla(q, k, v)
        chunked = attn.attn_xla_chunked(q, k, v, q_chunk=32, k_chunk=48)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=2e-4, atol=2e-5)

    def test_chunked_with_kv_len(self):
        q = rand(1, 10, 2, 8, key=1)
        k = rand(1, 64, 2, 8, key=2)
        v = rand(1, 64, 2, 8, key=3)
        full = attn.attn_xla(q, k, v, kv_len=37)
        chunked = attn.attn_xla_chunked(q, k, v, kv_len=37, q_chunk=8, k_chunk=16)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=2e-4, atol=2e-5)

    def test_dispatch_table(self):
        q = rand(1, 8, 2, 8, key=1)
        out = attn.attention("flash_attn3", q, q, q)
        ref = attn.attn_xla(q, q, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_matches_torch_sdpa(self):
        import torch

        q = rand(1, 33, 2, 8, key=4)
        k = rand(1, 47, 2, 8, key=5)
        v = rand(1, 47, 2, 8, key=6)
        ours = attn.attn_xla(q, k, v)
        tq, tk, tv = [torch.from_numpy(np.asarray(t)).permute(0, 2, 1, 3) for t in (q, k, v)]
        ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv).permute(0, 2, 1, 3).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
