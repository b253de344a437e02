"""Radial (block-sparse spatiotemporal-decay) attention.

Reference: lightx2v/attentions/common/radial_attn.py — the RadialAttention
O(n log n) mask: full attention within a frame, window width halving with
temporal distance (power-of-2 groups), frame 0 as attention sink, text
rows/columns dense; the block mask feeds a block-sparse flash kernel
(flashinfer BSR there, a scalar-prefetch Pallas kernel here).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.kernel_dispatch import kernel_fallback
import numpy as np

BLOCK = 128


def _window_width(dist: int, token_per_frame: int, decay_factor: float, model_type: str) -> float:
    """reference get_window_width (:131-151)."""
    if model_type == "wan":
        if dist < 1:
            return token_per_frame
        if dist == 1:
            return token_per_frame // 2
    elif model_type == "hunyuan":
        if dist <= 1:
            return token_per_frame
    group = dist.bit_length()
    decay = 2 ** token_per_frame.bit_length() / 2**group * decay_factor
    return decay if decay >= BLOCK else BLOCK


def _diag_split_keep(dist: int, token_per_frame: int) -> bool:
    """reference get_diagonal_split_mask (:115-129): distant frame pairs are
    kept only every split_factor-th diagonal."""
    group = dist.bit_length()
    decay = 2 ** token_per_frame.bit_length() / 2**group
    if decay >= BLOCK:
        return True
    return dist % int(BLOCK / decay) == 0


def radial_block_mask(
    seq_len: int,
    video_token_num: int,
    num_frame: int,
    decay_factor: float = 0.5,
    model_type: str = "wan",
    block_size: int = BLOCK,
) -> np.ndarray:
    """(nq, nk) boolean block mask (reference gen_log_mask_shrinked :154-196,
    computed directly at block granularity)."""
    s = ((seq_len + block_size - 1) // block_size) * block_size
    nb = s // block_size
    tpf = video_token_num // num_frame
    mask = np.zeros((nb, nb), bool)
    border = video_token_num // block_size
    mask[border:, :] = True
    mask[:, border:] = True

    centers = np.arange(nb) * block_size + block_size // 2  # block center tokens
    frame_of = np.minimum(centers // tpf, num_frame - 1)
    pos_in_frame = centers - frame_of * tpf

    for bi in range(min(border + 1, nb)):
        for bj in range(min(border + 1, nb)):
            i, j = int(frame_of[bi]), int(frame_of[bj])
            dist = abs(i - j)
            if j == 0:  # attention sink
                mask[bi, bj] = True
                continue
            if not _diag_split_keep(dist, tpf) and dist >= 1 and _window_width(dist, tpf, decay_factor, model_type) <= block_size:
                continue
            w = _window_width(dist, tpf, decay_factor, model_type)
            # block centers within the intra-frame window (block-granular test)
            if abs(int(pos_in_frame[bi]) - int(pos_in_frame[bj])) <= w + block_size:
                mask[bi, bj] = True
    np.fill_diagonal(mask, True)
    return mask


class MaskMap:
    """Cached block mask per (seq_len, config) — reference MaskMap (:197-211)."""

    def __init__(self, video_token_num: int, num_frame: int):
        self.video_token_num = video_token_num
        self.num_frame = num_frame
        self._mask: Optional[np.ndarray] = None

    def query_mask(self, seq_len: int, decay_factor: float = 0.5, model_type: str = "wan") -> np.ndarray:
        if self._mask is None or self._mask.shape[0] * BLOCK < seq_len:
            self._mask = radial_block_mask(seq_len, self.video_token_num, self.num_frame,
                                           decay_factor, model_type)
        return self._mask


def coarsen_block_mask(mask: np.ndarray, fq: int, fk: int) -> np.ndarray:
    """Union-pool a fine block mask to (fq x fk) superblocks.

    Keeps a SUPERSET of the fine mask, so quality can only improve; the
    payoff is running the sparse kernel at the dense flash kernel's tuned
    MXU tile sizes instead of 128x128.

    Tile-size tradeoff, measured at 720P/21f (fine density 0.328):
    2048x1024 -> 0.955 (x2.92 fine work), 2048x256 -> 0.820,
    1024x256 -> 0.588, 512x128 -> 0.427, 256x128 -> 0.360. The
    q-direction union drives the inflation (adjacent frames' windows
    shift, so a 2048-token q superblock unions ~16 shifted bands), but
    small tiles are DMA-latency-bound in the BSR kernel (round-1 sweep:
    (1024,256) ran 1.8x SLOWER than dense despite 0.59 density — a
    (bq,128)-tile step is ~0.2us of MXU against several us of
    scalar-prefetched k/v DMA that cannot overlap across steps). Radial
    therefore stays at dense-sized tiles with a modest win; sparge's
    learned selection, which concentrates mass into fewer superblocks,
    is the sparse path that pays on TPU (2.27x dense at 720P)."""
    nq, nk = mask.shape
    pq, pk = (-nq) % fq, (-nk) % fk
    m = np.pad(mask, ((0, pq), (0, pk)))
    return m.reshape((nq + pq) // fq, fq, (nk + pk) // fk, fk).any(axis=(1, 3))


def mask_to_indices(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(nq, nk) bool -> (indices (nq, max_nnz) int32, counts (nq,) int32)."""
    nq = mask.shape[0]
    counts = mask.sum(axis=1).astype(np.int32)
    max_nnz = max(int(counts.max()), 1)
    idx = np.zeros((nq, max_nnz), np.int32)
    for i in range(nq):
        nz = np.nonzero(mask[i])[0]
        idx[i, : len(nz)] = nz
        if len(nz) < max_nnz:
            idx[i, len(nz):] = nz[-1] if len(nz) else 0
    return idx, counts


@lru_cache(maxsize=8)
def _two_pass_plan(seq_len: int, video_token_num: int, num_frame: int,
                   decay_factor: float, model_type: str, block_q: int):
    """Host-side plan for the two-pass radial decomposition.

    The radial mask is, per frame pair, a diagonal band of width w(dist)
    (plus the frame-0 sink and dense text rows/cols). Instead of feeding a
    block mask to a sparse kernel — whose q-direction superblock union
    inflates density to ~dense (see coarsen_block_mask) — split it into
    two DENSE attentions over gathered keys:

    * near pass: for query frame fi, the full keys of 4 frames
      {sink 0} + 3 consecutive frames around fi, plus the text tail —
      contiguous slices, one (T x K_A) dense attention per frame;
    * far pass: for every kept far pair (diag-split rule) and q tile of
      bq rows, the band [tile_start - w, tile_start + bq + w) of fj —
      a CONTIGUOUS slice per (pair, tile), so an (nt*bq x K_far) dense
      attention with zero masking;

    merged exactly by LSE (parallel/ring.merge_partials). Every gathered
    set is a SUPERSET of the reference band mask (tile slack + clamping
    widen coverage; adjacent-frame bands widen d==1's T/2 to T), so
    quality can only improve, and both passes run at dense-flash MXU
    efficiency. Work ~= O(F * T * (4T + sum_d w(d))) — the reference's
    O(n log n) shape (radial_attn.py:154-196) without the union blowup.

    Returns (tpf, bq, near_idx (F, K_A) int32, fars: tuple of per-frame
    (nt, K_far_i) int32 or None, token_mask_builder)."""
    F = num_frame
    tpf = video_token_num // F
    if F < 5 or tpf < 2 * BLOCK:
        return None  # too small for the decomposition to pay; use BSR path
    # bq: largest divisor of tpf <= block_q (tiles must cover frames evenly)
    bq = max(d for d in range(1, min(block_q, tpf) + 1) if tpf % d == 0)
    nt = tpf // bq
    text_idx = np.arange(video_token_num, seq_len, dtype=np.int32)

    near_rows = []
    far_rows = []
    for fi in range(F):
        start = int(np.clip(fi - 1, 1, F - 3))
        near_frames = [0, start, start + 1, start + 2]
        near = np.concatenate(
            [np.arange(fr * tpf, (fr + 1) * tpf, dtype=np.int32) for fr in near_frames]
            + [text_idx])
        near_rows.append(near)

        tiles = []
        near_set = set(near_frames)
        for fj in range(1, F):
            if fj in near_set:
                continue
            dist = abs(fi - fj)
            w = _window_width(dist, tpf, decay_factor, model_type)
            if not _diag_split_keep(dist, tpf) and w <= BLOCK:
                continue  # dropped diagonal (reference split rule)
            wd = min(int(np.ceil(w)), tpf)
            width = min(bq + 2 * wd, tpf)
            starts = np.clip(np.arange(nt) * bq - wd, 0, tpf - width)
            idx = fj * tpf + starts[:, None] + np.arange(width)[None, :]
            tiles.append(idx.astype(np.int32))
        far_rows.append(np.concatenate(tiles, axis=1) if tiles else None)

    return tpf, bq, np.stack(near_rows), tuple(far_rows)


def two_pass_token_mask(seq_len: int, video_token_num: int, num_frame: int,
                        decay_factor: float = 0.5, model_type: str = "wan",
                        block_q: int = 256) -> np.ndarray:
    """Token-level coverage of the two-pass plan (tests: must be a
    superset of the reference band mask, and the exact oracle mask for
    radial_two_pass outputs)."""
    plan = _two_pass_plan(seq_len, video_token_num, num_frame,
                          decay_factor, model_type, block_q)
    assert plan is not None
    tpf, bq, near_idx, fars = plan
    mask = np.zeros((seq_len, seq_len), bool)
    mask[video_token_num:, :] = True  # text rows dense
    for fi in range(num_frame):
        rows = slice(fi * tpf, (fi + 1) * tpf)
        mask[rows, near_idx[fi]] = True
        if fars[fi] is not None:
            for t in range(fars[fi].shape[0]):
                mask[fi * tpf + t * bq: fi * tpf + (t + 1) * bq, fars[fi][t]] = True
    return mask


def radial_two_pass(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask_map: MaskMap, decay_factor: float = 0.5,
                    model_type: str = "wan", block_q: int = 256) -> Optional[jnp.ndarray]:
    """Two-pass near/far radial attention (see _two_pass_plan). q/k/v
    (B, S, N, D). Returns None when the shape doesn't fit the plan
    (caller falls back to the BSR/dense path)."""
    from ..parallel.ring import merge_partials, partial_attention

    b, s, n, d = q.shape
    plan = _two_pass_plan(s, mask_map.video_token_num, mask_map.num_frame,
                          decay_factor, model_type, block_q)
    if plan is None:
        return None
    tpf, bq, near_idx, fars = plan
    F = mask_map.num_frame
    nt = tpf // bq
    near_dev = jnp.asarray(near_idx)

    outs = []
    for fi in range(F):
        qf = jax.lax.dynamic_slice_in_dim(q, fi * tpf, tpf, axis=1)
        ka = jnp.take(k, near_dev[fi], axis=1)
        va = jnp.take(v, near_dev[fi], axis=1)
        out_a, lse_a = partial_attention(qf, ka, va)
        if fars[fi] is not None:
            fidx = jnp.asarray(fars[fi])  # (nt, K_far)
            kf = jnp.take(k, fidx.reshape(-1), axis=1).reshape(b, nt, -1, n, d)
            vf = jnp.take(v, fidx.reshape(-1), axis=1).reshape(b, nt, -1, n, d)
            qt = qf.reshape(b, nt, bq, n, d)
            out_f, lse_f = partial_attention(
                qt.reshape(b * nt, bq, n, d),
                kf.reshape(b * nt, -1, n, d),
                vf.reshape(b * nt, -1, n, d))
            out_f = out_f.reshape(b, tpf, n, d)
            lse_f = lse_f.reshape(b, tpf, n)
            out_a, _ = merge_partials(out_a, lse_a, out_f, lse_f)
        outs.append(out_a)
    video_out = jnp.concatenate(outs, axis=1)
    if s > F * tpf:  # dense text rows over all keys
        qt = q[:, F * tpf:]
        out_t, _ = partial_attention(qt, k, v)
        video_out = jnp.concatenate([video_out, out_t], axis=1)
    return video_out.astype(q.dtype)


def radial_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_map: Optional[MaskMap] = None,
    sparsity_type: str = "radial",
    decay_factor: float = 0.5,
    model_type: str = "wan",
    block_q: int = 2048,
    block_k: int = 1024,
) -> jnp.ndarray:
    """q/k/v (B, S, N, D). Falls back to dense when no mask_map is given.

    The mask is generated at the reference's 128-token granularity
    (radial_attn.py:154-196 parity) and union-pooled to (block_q, block_k)
    superblocks for execution — identical coverage guarantees, dense-tile
    MXU efficiency."""
    s = q.shape[1]
    if mask_map is None:
        from .attention import attention

        return attention("flash_attn3", q, k, v)
    if sparsity_type != "bsr":
        # two-pass near/far decomposition: dense-tile MXU efficiency at
        # ~0.36x dense work at 720P (see _two_pass_plan); declines small
        # shapes where the window floors dominate
        out = radial_two_pass(q, k, v, mask_map, decay_factor, model_type,
                              block_q=min(block_q, 256))
        if out is not None:
            return out
    mask = mask_map.query_mask(s, decay_factor, model_type)
    if jax.default_backend() == "tpu":
        try:
            from .pallas.block_sparse_attention import block_sparse_attention

            bq = min(block_q, max(128, 1 << (s - 1).bit_length()))
            bk = min(block_k, max(128, 1 << (k.shape[1] - 1).bit_length()))
            coarse = coarsen_block_mask(mask, bq // BLOCK, bk // BLOCK)
            idx, counts = mask_to_indices(coarse)
            return block_sparse_attention(q, k, v, jnp.asarray(idx), jnp.asarray(counts),
                                          bq=bq, bk=bk)
        except Exception as e:
            kernel_fallback("block_sparse_attention", e)
    # dense fallback: expand the block mask to token level
    nb = mask.shape[0]
    tok_mask = np.repeat(np.repeat(mask, BLOCK, 0), BLOCK, 1)[:s, :s]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(q.shape[-1])
    logits = jnp.where(jnp.asarray(tok_mask)[None, None], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", p, v).astype(q.dtype)
