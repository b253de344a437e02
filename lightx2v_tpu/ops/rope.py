"""3D rotary position embeddings for video DiTs.

Reference semantics (lightx2v/models/networks/wan/infer/utils.py:7-158):
the head dim d splits into [d - 4*(d//6), 2*(d//6), 2*(d//6)] halves for
(frame, height, width); per-axis 1D rope tables (theta=10000) are built
to max length 1024 and gathered/broadcast over the (f, h, w) grid. The
reference applies rotation via fp64 complex multiply; on TPU we use the
algebraically identical fp32 cos/sin pair form:

    out_even = x_even*cos - x_odd*sin
    out_odd  = x_even*sin + x_odd*cos

with pairs interleaved along the head dim (matching torch.view_as_complex
on a (..., d/2, 2) reshape). fp32 vs fp64 tables differ by < 1e-4 for
positions < 1024, well inside bf16 activation noise.
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_params_1d(max_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Per-axis rope angles: (max_len, dim//2) fp32 (host-side table)."""
    assert dim % 2 == 0
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    angles = np.outer(np.arange(max_len, dtype=np.float64), inv)
    return angles.astype(np.float32)


def build_wan_rope_grid(
    head_dim: int,
    f: int,
    h: int,
    w: int,
    max_len: int = 1024,
    start_frame: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables over the flattened (f*h*w) token grid.

    Returns (cos, sin), each (f*h*w, head_dim//2) fp32. ``start_frame``
    offsets the temporal axis (CausVid AR windows; reference:
    infer/utils.py:62-75).
    """
    c = head_dim // 2
    d_t = head_dim - 4 * (head_dim // 6)  # temporal half-dims*2
    d_hw = 2 * (head_dim // 6)
    ang_t = rope_params_1d(max_len, d_t)
    ang_h = rope_params_1d(max_len, d_hw)
    ang_w = rope_params_1d(max_len, d_hw)

    # split sizes along the c axis: [c - 2*(c//3), c//3, c//3]
    a_t = ang_t[start_frame : start_frame + f][:, None, None, :]  # (f,1,1,ct)
    a_h = ang_h[:h][None, :, None, :]
    a_w = ang_w[:w][None, None, :, :]
    grid = np.concatenate(
        [
            np.broadcast_to(a_t, (f, h, w, a_t.shape[-1])),
            np.broadcast_to(a_h, (f, h, w, a_h.shape[-1])),
            np.broadcast_to(a_w, (f, h, w, a_w.shape[-1])),
        ],
        axis=-1,
    ).reshape(f * h * w, c)
    return np.cos(grid), np.sin(grid)


def _rope_compute_dtype():
    """Rotation math dtype. LIGHTX2V_ROPE_BF16=1 opts into bf16 rotation
    (halves the rotation temps again — the capacity lever that brings
    int8+sparge within reach of one v5e, NEXT_STEPS r4; quality bound
    measured on the fidelity ladder's int8-sparge-bf16rope rung). Read
    at trace time: callers jit AROUND these functions, and the bench
    processes set the env before the first trace."""
    import os

    return jnp.bfloat16 if os.environ.get("LIGHTX2V_ROPE_BF16") == "1" else jnp.float32


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs. x: (..., S, N, D); cos/sin: (S, D//2).

    Tokens beyond the rope table length (S_rope <= S) pass through
    unchanged, matching the reference's concat of the untouched tail
    (infer/utils.py:114).
    """
    s_rope = cos.shape[0]
    seq = x.shape[-3]
    # f32 math on the even/odd halves only; cast back BEFORE the
    # stack/concat so no full-width f32 slab survives as an HLO temp
    # (at 14B 480P a full-seq f32 q or k copy is 640 MB each).
    cdt = _rope_compute_dtype()
    xr = x[..., :s_rope, :, :]
    even = xr[..., 0::2].astype(cdt)
    odd = xr[..., 1::2].astype(cdt)
    c = cos[..., :, None, :].astype(cdt)
    s = sin[..., :, None, :].astype(cdt)
    out_even = (even * c - odd * s).astype(x.dtype)
    out_odd = (even * s + odd * c).astype(x.dtype)
    rotated = jnp.stack([out_even, out_odd], axis=-1).reshape(xr.shape)
    if s_rope < seq:
        rotated = jnp.concatenate([rotated, x[..., s_rope:, :, :]], axis=-3)
    return rotated


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotation in HALF-SPLIT pair layout: feature i pairs with i + d/2
    (instead of interleaved 2i/2i+1). Used when q/k projections were
    permuted at load time (models/wan/weights.py permute_qk_half) so the
    flash kernel can rotate with lane-contiguous half slices. Numerically
    identical attention: the same permutation is applied to q and k, and
    scores are invariant under a shared feature permutation."""
    s_rope = cos.shape[0]
    seq = x.shape[-3]
    d2 = x.shape[-1] // 2
    # same half-width-f32 discipline as apply_rope: cast each rotated
    # half to the activation dtype before concat (no 640 MB f32 temps)
    cdt = _rope_compute_dtype()
    xr = x[..., :s_rope, :, :]
    x1 = xr[..., :d2].astype(cdt)
    x2 = xr[..., d2:].astype(cdt)
    c = cos[..., :, None, :].astype(cdt)
    s = sin[..., :, None, :].astype(cdt)
    lo = (x1 * c - x2 * s).astype(x.dtype)
    hi = (x1 * s + x2 * c).astype(x.dtype)
    rotated = jnp.concatenate([lo, hi], axis=-1)
    if s_rope < seq:
        rotated = jnp.concatenate([rotated, x[..., s_rope:, :, :]], axis=-3)
    return rotated


def rope_tables_full(cos: jnp.ndarray, sin: jnp.ndarray):
    """(S, d/2) pair tables -> full-width (S, d) tables for the in-kernel
    half-split rotation: rot(x) = x*[c|c] + roll_half(x)*[-s|s]."""
    cos_full = jnp.concatenate([cos, cos], axis=-1)
    sin_full = jnp.concatenate([-sin, sin], axis=-1)
    return cos_full.astype(jnp.float32), sin_full.astype(jnp.float32)


def zero_temporal_rope(cos: np.ndarray, sin: np.ndarray, valid_len: int, head_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Zero the temporal rope component for tokens >= valid_len (audio/r2v
    extension tokens; reference: transformer_infer.py:254-267). Zeroing the
    angle means cos=1, sin=0 in pair form."""
    ct = (head_dim // 2) - 2 * ((head_dim // 2) // 3)
    cos = cos.copy()
    sin = sin.copy()
    cos[valid_len:, :ct] = 1.0
    sin[valid_len:, :ct] = 0.0
    return cos, sin


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """Timestep embedding: [cos | sin] halves (reference: infer/utils.py:161-172)."""
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def guidance_scale_embedding(
    w: jnp.ndarray,
    embedding_dim: int = 256,
    cfg_range: Tuple[float, float] = (1.0, 8.0),
    target_range: float = 1000.0,
) -> jnp.ndarray:
    """CFG-scale conditioning embedding for dynamic-CFG distilled models
    (reference: infer/utils.py:175-197). Layout is [sin | cos]."""
    cfg_min, cfg_max = cfg_range
    wn = (w - cfg_min) / (cfg_max - cfg_min) * target_range
    half = embedding_dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1)))
    emb = wn.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
