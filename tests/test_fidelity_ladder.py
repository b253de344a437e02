"""Fidelity-ladder machinery (scripts/bench/bench_fidelity.py).

The ladder is the quality-parity evidence for the flagship perf config
(VERDICT r3 weak #1): every scheme must be derived from the SAME master
weights, so scheme deltas measure quantization/sparsity — not different
random draws. These tests pin

* quantize_params_on_device == tools.convert.quantize_tensor layouts
  (same int8/fp8/int4 math as the offline converter, reference
  tools/convert/converter.py:294-341), and
* the tiny-preset ladder runs end-to-end on CPU with sane SNR ordering
  (quant-only rungs land above sparse rungs; bf16 reference row first).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.weights import (init_random_params_on_device,
                                             quantize_params_on_device)
from lightx2v_tpu.tools.convert import quantize_tensor

ARCH = WanArch(dim=128, ffn_dim=256, num_heads=4, num_layers=2,
               in_dim=16, out_dim=16, text_len=32, text_dim=128)


@pytest.mark.parametrize("scheme", ["int8", "fp8", "int4"])
def test_on_device_quantizer_matches_converter(scheme):
    params = init_random_params_on_device(ARCH, scheme="bf16", seed=3)
    qp = quantize_params_on_device(params, scheme)
    # stacked block linears are quantized; compare layer 0 of ffn.0
    w = np.asarray(params["blocks"]["ffn"]["0"]["w"][0], np.float32)
    got_w = np.asarray(qp["blocks"]["ffn"]["0"]["w"][0])
    got_s = np.asarray(qp["blocks"]["ffn"]["0"]["w_scale"][0], np.float32)
    ref_w, ref_s = quantize_tensor(w, scheme)
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-5)
    if scheme == "fp8":
        np.testing.assert_array_equal(got_w.view(np.uint8), ref_w.view(np.uint8))
    elif scheme == "int4":
        # same packing layout; values may differ by ONE quant level on
        # rounding ties (XLA vs numpy fp32 division, last-ulp) — bound it
        def unpack(p):
            lo = (p & 15).astype(np.int16) - 8
            hi = (p >> 4).astype(np.int16) - 8
            return np.concatenate([lo, hi], axis=-1)
        dq = np.abs(unpack(got_w) - unpack(ref_w))
        assert dq.max() <= 1
        assert (dq > 0).mean() < 0.01
    else:
        np.testing.assert_array_equal(got_w, ref_w)
    # non-block leaves are shared with the master (no copies, no quant)
    assert qp["head"]["w"] is params["head"]["w"]


def test_quantizer_bf16_is_identity():
    params = init_random_params_on_device(ARCH, scheme="bf16", seed=0)
    assert quantize_params_on_device(params, "bf16") is params


def test_tiny_ladder_runs_and_orders(capsys, monkeypatch):
    import importlib

    mod = importlib.import_module("scripts.bench.bench_fidelity")
    monkeypatch.setenv("BENCH_PRESET", "tiny")
    monkeypatch.setenv(
        "BENCH_RUNGS", "int8-dense,w4a8-dense,w4a8-sparge0.5,bf16-ropefused")
    mod.main()
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    by = {r["rung"]: r for r in rows}
    assert rows[0]["rung"] == "bf16-dense" and rows[0]["latent_snr_db"] is None
    for name in ("int8-dense", "w4a8-dense", "w4a8-sparge0.5", "bf16-ropefused"):
        r = by[name]
        assert np.isfinite(r["latent_snr_db"]) and np.isfinite(r["frame_snr_db"])
    # quant-only rungs must clear the reference kernel bar analog (30 dB);
    # fused-rope is a pure permutation — near-exact vs bf16-dense
    assert by["int8-dense"]["latent_snr_db"] > 30.0
    assert by["bf16-ropefused"]["latent_snr_db"] > 35.0
    # sparsity on top of w4a8 cannot IMPROVE fidelity
    assert by["w4a8-sparge0.5"]["latent_snr_db"] <= by["w4a8-dense"]["latent_snr_db"] + 1.0
