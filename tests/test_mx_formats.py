"""mx-format (block-32 pow2 scale) quant paths vs float oracles.

Mirrors the reference's kernel accuracy protocol: quant GEMM rel-err
< 1e-2 vs the bf16 linear (lightx2v_kernel test/mxfp8_mxfp8/
test_mxfp8_quant.py:18-37; mxfp6 packing = the 3n/4 layout of
mxfp6_*.cu)."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from lightx2v_tpu.ops.linear import resolve_mm, unpack_fp6_e2m3
from lightx2v_tpu.tools.convert import mm_type_for_scheme, quantize_tensor


def _wx(n=96, k=256, m=48, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ w.T
    return w, x, ref


def test_mxfp8_scales_are_pow2_block32():
    w, _, _ = _wx()
    q, s = quantize_tensor(w, "mxfp8")
    assert q.shape == w.shape and q.dtype == ml_dtypes.float8_e4m3fn
    assert s.shape == (w.shape[0], w.shape[1] // 32)
    np.testing.assert_array_equal(np.exp2(np.round(np.log2(s))), s)


def test_mxfp6_pack_unpack_roundtrip():
    w, _, _ = _wx(seed=3)
    packed, s = quantize_tensor(w, "mxfp6")
    assert packed.shape == (w.shape[0], 3 * w.shape[1] // 4)
    assert packed.dtype == np.uint8
    got = np.asarray(unpack_fp6_e2m3(jnp.asarray(packed), w.shape[1]), np.float32)
    # oracle: direct fp6 cast of the scaled elements
    el = (w.reshape(w.shape[0], -1, 32) / s[:, :, None])
    want = el.astype(ml_dtypes.float6_e2m3fn).astype(np.float32).reshape(w.shape)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scheme,bar", [("mxfp8", 5e-2), ("mxfp6", 4e-2)])
def test_mx_mm_accuracy_vs_float_linear(scheme, bar):
    w, x, ref = _wx(seed=7)
    q, s = quantize_tensor(w, scheme)
    fn = resolve_mm(mm_type_for_scheme(scheme))
    out = np.asarray(fn({"w": jnp.asarray(q), "w_scale": jnp.asarray(s), "b": None}, x),
                     np.float32)
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert out.shape == ref.shape and rel < bar, f"{scheme} rel err {rel}"


def test_mxfp8_with_bias_and_batch():
    w, x, ref = _wx(seed=11)
    rng = np.random.default_rng(11)
    b = (rng.standard_normal(w.shape[0]) * 0.1).astype(np.float32)
    q, s = quantize_tensor(w, "mxfp8")
    fn = resolve_mm("W-mxfp8-A-mxfp8-dynamic-Tpu")
    x3 = x.reshape(2, -1, x.shape[-1])
    out = np.asarray(fn({"w": jnp.asarray(q), "w_scale": jnp.asarray(s),
                         "b": jnp.asarray(b)}, x3), np.float32)
    assert out.shape == (2, x.shape[0] // 2, w.shape[0])
    rel = np.abs(out.reshape(ref.shape) - (ref + b)).mean() / (np.abs(ref + b).mean() + 1e-9)
    # two e4m3 stages (weights + acts) -> ~2.5% each, RSS ~3.5%; same
    # class as the per-channel fp8 path's 4e-2 bar in test_w8a8.py
    assert rel < 5e-2, f"rel err {rel}"
