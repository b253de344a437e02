"""Pallas flash-attention kernel numerics vs the XLA oracle (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.ops.attention import attn_xla
from lightx2v_tpu.ops.pallas.flash_attention import flash_attention


def rand(*shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


@pytest.mark.parametrize("sq,sk,bq,bk", [
    (256, 256, 128, 128),
    (200, 300, 128, 128),   # unaligned -> padding + masking
    (128, 512, 128, 256),
])
def test_matches_oracle(sq, sk, bq, bk):
    b, n, d = 1, 2, 128
    q = rand(b, sq, n, d, key=1).astype(jnp.bfloat16)
    k = rand(b, sk, n, d, key=2).astype(jnp.bfloat16)
    v = rand(b, sk, n, d, key=3).astype(jnp.bfloat16)
    ref = np.asarray(attn_xla(q, k, v), np.float32)
    out = np.asarray(flash_attention(q, k, v, bq=bq, bk=bk, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.02)
    c = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_kv_len_mask():
    b, n, d = 1, 1, 128
    q = rand(b, 128, n, d, key=4).astype(jnp.bfloat16)
    k = rand(b, 256, n, d, key=5).astype(jnp.bfloat16)
    v = rand(b, 256, n, d, key=6).astype(jnp.bfloat16)
    ref = np.asarray(attn_xla(q, k, v, kv_len=200), np.float32)
    out = np.asarray(flash_attention(q, k, v, kv_len=200, bq=128, bk=128, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.02)


def test_compiles_on_backend():
    """The kernel must at least trace+lower without interpret mode when a
    TPU is present; on CPU interpret fallback is exercised above."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU")
    q = rand(1, 512, 2, 128).astype(jnp.bfloat16)
    out = flash_attention(q, q, q)
    assert out.shape == q.shape


class TestSageAttention:
    def test_matches_oracle(self):
        from lightx2v_tpu.ops.pallas.sage_attention import sage_attention

        q = rand(1, 256, 2, 128, key=7).astype(jnp.bfloat16)
        k = rand(1, 300, 2, 128, key=8).astype(jnp.bfloat16)
        v = rand(1, 300, 2, 128, key=9).astype(jnp.bfloat16)
        ref = np.asarray(attn_xla(q, k, v), np.float32)
        out = np.asarray(sage_attention(q, k, v, bq=128, bk=128, interpret=True), np.float32)
        # int8 QK: SNR-style bar like the reference's quant kernels
        snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
        assert snr < 1e-2, f"snr {snr}"
        c = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert c > 0.995, f"corr {c}"

    def test_kv_len(self):
        from lightx2v_tpu.ops.pallas.sage_attention import sage_attention

        q = rand(1, 128, 1, 128, key=10).astype(jnp.bfloat16)
        k = rand(1, 256, 1, 128, key=11).astype(jnp.bfloat16)
        v = rand(1, 256, 1, 128, key=12).astype(jnp.bfloat16)
        ref = np.asarray(attn_xla(q, k, v, kv_len=180), np.float32)
        out = np.asarray(sage_attention(q, k, v, kv_len=180, bq=128, bk=128, interpret=True), np.float32)
        snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
        assert snr < 1e-2




def test_phantom_pad_correction_equals_masked():
    """Static full-length kv on an unaligned shape takes the "phantom"
    path (no per-step masking; the zero pad rows' exact mass
    npad*exp2(-m) is subtracted at the end). It must agree with the
    dynamically masked path to fp32-association noise."""
    b, n, d = 1, 2, 128
    sq = sk = 200  # pads to 256 -> npad=56 phantom rows
    q = rand(b, sq, n, d, key=7).astype(jnp.bfloat16)
    k = rand(b, sk, n, d, key=8).astype(jnp.bfloat16)
    v = rand(b, sk, n, d, key=9).astype(jnp.bfloat16)
    phantom = np.asarray(flash_attention(q, k, v, bq=128, bk=128, interpret=True), np.float32)
    masked = np.asarray(flash_attention(q, k, v, kv_len=jnp.asarray(sk), bq=128, bk=128,
                                        interpret=True), np.float32)
    np.testing.assert_allclose(phantom, masked, rtol=2e-3, atol=2e-3)
