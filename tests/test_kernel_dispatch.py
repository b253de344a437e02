"""Kernel-fallback policy: loud, and strict mode turns misses into errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.utils import kernel_dispatch as kd


def test_fallback_warns_once(monkeypatch, caplog=None):
    monkeypatch.delenv("LIGHTX2V_STRICT_KERNELS", raising=False)
    kd._warned.clear()
    kd.kernel_fallback("fake_kernel", ValueError("boom"))  # warns
    kd.kernel_fallback("fake_kernel", ValueError("boom2"))  # deduped
    assert ("fake_kernel", "ValueError") in kd._warned


def test_strict_mode_raises(monkeypatch):
    monkeypatch.setenv("LIGHTX2V_STRICT_KERNELS", "1")
    with pytest.raises(RuntimeError, match="fake_kernel"):
        kd.kernel_fallback("fake_kernel", ValueError("boom"))


def test_pallas_kernels_selected_on_tpu():
    """On real TPU, strict mode must pass: the Pallas flash kernel (not the
    XLA fallback) handles the dispatch. Skipped on CPU (no Pallas backend)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU")
    from lightx2v_tpu.ops.attention import attention

    rng = np.random.default_rng(0)
    q, k, v = [jnp.asarray(rng.standard_normal((1, 256, 4, 64)), jnp.bfloat16) for _ in range(3)]
    import os

    os.environ["LIGHTX2V_STRICT_KERNELS"] = "1"
    try:
        out = attention("flash_attn3", q, k, v)
        assert np.isfinite(np.asarray(out, np.float32)).all()
    finally:
        os.environ.pop("LIGHTX2V_STRICT_KERNELS", None)
