"""Weight-only int4 matmul tests (ops/pallas/int4_matmul.py — the TPU
analog of the reference's nvfp4 GEMM kernels, SNR bar as in the
reference's kernel accuracy tests, rel-sq-error < 1e-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from lightx2v_tpu.ops.linear import resolve_mm
from lightx2v_tpu.ops.pallas.int4_matmul import (
    BK, int4_matmul, int4_matmul_xla, quantize_int4, unpack_int4,
)


def _wx(m=64, n=96, k=2 * BK, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.float32)
    return w, x


def test_pack_unpack_roundtrip():
    w, _ = _wx()
    packed, scale = quantize_int4(w)
    assert packed.shape == (96, BK) and packed.dtype == np.uint8
    assert scale.shape == (96, 2)
    deq = np.asarray(unpack_int4(jnp.asarray(packed), jnp.asarray(scale)))
    # quantization error bounded by scale/2 per element
    bound = np.repeat(scale, BK, axis=1) * 0.5 + 1e-6
    assert (np.abs(deq - w) <= bound).all()


def test_xla_fallback_matches_dense():
    w, x = _wx(seed=1)
    packed, scale = quantize_int4(w)
    ref = np.asarray(x @ w.T, np.float32)
    out = np.asarray(int4_matmul_xla(x, jnp.asarray(packed), jnp.asarray(scale)), np.float32)
    # uniform int4 on gaussian weights floors at ~1.9e-2 rel-sq error
    # (step ~= 0.47 sigma -> step^2/12 ~= 0.018 sigma^2); the reference's
    # 1e-2 bar is for the nonuniform fp4 format
    snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
    assert snr < 3e-2, f"snr {snr}"
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99


def test_pallas_interpret_matches_xla():
    w, x = _wx(m=40, n=72, seed=2)  # non-multiples of block sizes
    packed, scale = quantize_int4(w)
    ref = np.asarray(int4_matmul_xla(x, jnp.asarray(packed), jnp.asarray(scale)), np.float32)
    out = np.asarray(
        int4_matmul(x.astype(jnp.bfloat16), jnp.asarray(packed), jnp.asarray(scale),
                    bm=32, bn=64, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
    c = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_mm_registry_int4():
    w, x = _wx(seed=3)
    packed, scale = quantize_int4(w)
    fn = resolve_mm("W-int4-group-sym-A-bf16-Tpu")
    b = jnp.asarray(np.random.default_rng(4).standard_normal(96) * 0.1, jnp.float32)
    out = np.asarray(fn({"w": jnp.asarray(packed), "w_scale": jnp.asarray(scale), "b": b}, x), np.float32)
    ref = np.asarray(x @ w.T + b, np.float32)
    snr = ((out - ref) ** 2).mean() / ((ref**2).mean() + 1e-9)
    assert snr < 3e-2, f"snr {snr}"


def test_batched_leading_dims():
    w, _ = _wx(seed=5)
    packed, scale = quantize_int4(w)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 7, 2 * BK)) * 0.5, jnp.float32)
    out = int4_matmul_xla(x, jnp.asarray(packed), jnp.asarray(scale))
    assert out.shape == (2, 7, 96)
