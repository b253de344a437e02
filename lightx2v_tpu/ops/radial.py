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
from ..utils.logging_utils import logger
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
      {sink 0} + 3 consecutive frames around fi, plus the text tail;
    * far pass: for every kept far pair (diag-split rule) and q tile of
      bq rows, a window of bq-sized key BLOCKS covering the band
      [tile_start - w, tile_start + bq + w) of fj;

    merged exactly by LSE (parallel/ring.merge_partials). All gathers are
    COARSE — whole frames for the near pass, bq-row blocks for the far
    pass — because XLA token-row gathers run at ~1/40 of HBM bandwidth
    on TPU (measured 20 GB/s) while big-row gathers stream at full rate.
    Every gathered set is a SUPERSET of the reference band mask (block
    rounding + clamping widen coverage; adjacent-frame bands widen
    d==1's T/2 to T), so quality can only improve, and both passes run
    at dense-flash MXU efficiency. Work ~= O(F * T * (4T + sum_d w(d)))
    — the reference's O(n log n) shape (radial_attn.py:154-196) without
    the superblock-union blowup.

    Returns (tpf, bq, near_frames (F, 4) int32 frame ids,
    far_blocks (F, nt, NWIN) int32 into the F*nt block axis)."""
    F = num_frame
    tpf = video_token_num // F
    if F < 5 or tpf < 2 * BLOCK:
        return None  # too small for the decomposition to pay; use BSR path
    # bq: largest divisor of tpf <= block_q (tiles must cover frames evenly)
    bq = max(d for d in range(1, min(block_q, tpf) + 1) if tpf % d == 0)
    nt = tpf // bq

    near_frames = []
    far_specs = []  # per frame: list of (fj, nwin_blocks)
    for fi in range(F):
        start = int(np.clip(fi - 1, 1, F - 3))
        nf = [0, start, start + 1, start + 2]
        near_frames.append(nf)

        spec = []
        near_set = set(nf)
        for fj in range(1, F):
            if fj in near_set:
                continue
            dist = abs(fi - fj)
            w = _window_width(dist, tpf, decay_factor, model_type)
            if not _diag_split_keep(dist, tpf) and w <= BLOCK:
                continue  # dropped diagonal (reference split rule)
            h = int(np.ceil(w / bq))  # band half-width in blocks
            spec.append([fj, min(2 * h + 1, nt)])
        far_specs.append(spec)

    if any(not s for s in far_specs):
        return None  # a frame with no far pairs: near pass would miss keys

    # uniform window-block count across frames (ONE compiled far step):
    # growing a window by whole blocks is a superset
    nwin = max(sum(nw for _, nw in s) for s in far_specs)
    if any(len(s) * nt < nwin for s in far_specs):
        return None  # can't uniformize (toy shapes: bands ~ whole frames)

    far_rows = []
    for spec in far_specs:
        nws = [nw for _, nw in spec]
        deficit = nwin - sum(nws)
        for i_ in range(len(nws)):
            if deficit <= 0:
                break
            grow = min(deficit, nt - nws[i_])
            nws[i_] += grow
            deficit -= grow
        assert deficit == 0
        tiles = []
        for (fj, _), nw in zip(spec, nws):
            h = (nw - 1) // 2
            starts = np.clip(np.arange(nt) - h, 0, nt - nw)
            idx = fj * nt + starts[:, None] + np.arange(nw)[None, :]
            tiles.append(idx.astype(np.int32))
        far_rows.append(np.concatenate(tiles, axis=1))  # (nt, nwin)

    return tpf, bq, np.asarray(near_frames, np.int32), np.stack(far_rows)


def two_pass_token_mask(seq_len: int, video_token_num: int, num_frame: int,
                        decay_factor: float = 0.5, model_type: str = "wan",
                        block_q: int = 256) -> np.ndarray:
    """Token-level coverage of the two-pass plan (tests: must be a
    superset of the reference band mask, and the exact oracle mask for
    radial_two_pass outputs)."""
    plan = _two_pass_plan(seq_len, video_token_num, num_frame,
                          decay_factor, model_type, block_q)
    assert plan is not None
    tpf, bq, near_frames, far_blocks = plan
    nt = tpf // bq
    mask = np.zeros((seq_len, seq_len), bool)
    mask[video_token_num:, :] = True  # text rows dense
    mask[:, video_token_num:] = True  # text cols in the near key set
    for fi in range(num_frame):
        rows = slice(fi * tpf, (fi + 1) * tpf)
        for fr in near_frames[fi]:
            mask[rows, fr * tpf:(fr + 1) * tpf] = True
        for t in range(nt):
            r = slice(fi * tpf + t * bq, fi * tpf + (t + 1) * bq)
            for blk in far_blocks[fi, t]:
                mask[r, blk * bq:(blk + 1) * bq] = True
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
    tpf, bq, near_frames, far_blocks = plan
    F = mask_map.num_frame
    nt = tpf // bq
    nwin = far_blocks.shape[2]
    video = F * tpf

    # near pass: frame-granular gather (84 rows of tpf*n*d — streams at
    # full HBM bandwidth, unlike token-row gathers) + text tail
    kfr = k[:, :video].reshape(b, F, tpf, n, d)
    vfr = v[:, :video].reshape(b, F, tpf, n, d)
    nearf = jnp.asarray(near_frames.reshape(-1))
    ka = jnp.take(kfr, nearf, axis=1).reshape(b, F, 4 * tpf, n, d)
    va = jnp.take(vfr, nearf, axis=1).reshape(b, F, 4 * tpf, n, d)
    if s > video:  # text keys replicated into every frame's near set
        kt = jnp.broadcast_to(k[:, None, video:], (b, F, s - video, n, d))
        vt = jnp.broadcast_to(v[:, None, video:], (b, F, s - video, n, d))
        ka = jnp.concatenate([ka, kt], axis=2)
        va = jnp.concatenate([va, vt], axis=2)
    k_a = ka.shape[2]
    qv = q[:, :video].reshape(b, F, tpf, n, d)
    out_a, lse_a = partial_attention(
        qv.reshape(b * F, tpf, n, d),
        ka.reshape(b * F, k_a, n, d), va.reshape(b * F, k_a, n, d))

    # far pass: bq-block-granular windows, lax.scan over frames (a single
    # batched gather would materialize F*nt*nwin*bq keys at once)
    kb = k[:, :video].reshape(b, F * nt, bq, n, d)
    vb = v[:, :video].reshape(b, F * nt, bq, n, d)
    fidx_all = jnp.asarray(far_blocks.reshape(F, nt * nwin))
    q_frames = qv.transpose(1, 0, 2, 3, 4)

    def far_body(_, xs):
        fidx, qf = xs  # (nt*nwin,), (b, tpf, n, d)
        kf = jnp.take(kb, fidx, axis=1).reshape(b, nt, nwin * bq, n, d)
        vf = jnp.take(vb, fidx, axis=1).reshape(b, nt, nwin * bq, n, d)
        o, l = partial_attention(
            qf.reshape(b * nt, bq, n, d),
            kf.reshape(b * nt, nwin * bq, n, d),
            vf.reshape(b * nt, nwin * bq, n, d))
        return None, (o.reshape(b, tpf, n, d), l.reshape(b, tpf, n))

    _, (out_f, lse_f) = jax.lax.scan(far_body, None, (fidx_all, q_frames))
    out_f = out_f.transpose(1, 0, 2, 3, 4).reshape(b * F, tpf, n, d)
    lse_f = lse_f.transpose(1, 0, 2, 3).reshape(b * F, tpf, n)

    out, _ = merge_partials(out_a, lse_a, out_f, lse_f)
    video_out = out.reshape(b, video, n, d)
    if s > video:  # dense text rows over all keys
        out_t, _ = partial_attention(q[:, video:], k, v)
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

    TPU execution policy (measured anti-win, documented): on real TPU the
    radial mask is served by DENSE flash attention. Dense is a strict
    superset of every radial mask (same or better quality) and it beat
    every sparse execution tried at the 720P operating point on v5e:
    coarsened-BSR superblocks ran at 0.95x dense speed (q-direction
    union inflation, see coarsen_block_mask), the gather-based two-pass
    near/far decomposition at 0.64x, and its block-granular-gather
    rewrite at 0.33x — the 0.36x work reduction exists on paper
    (_two_pass_plan) but XLA gather throughput (~20 GB/s for token rows)
    and sub-dense kernel efficiency at banded shapes eat it. The
    reference's O(n log n) win is CUDA-economics (flashinfer BSR),
    not TPU-economics; sparge is the sparse path that pays here
    (1.99x dense at 720P). Opt into the experimental executions with
    sparsity_type="two_pass" or "bsr"."""
    s = q.shape[1]
    if mask_map is None:
        from .attention import attention

        return attention("flash_attn3", q, k, v)
    if sparsity_type == "two_pass":
        out = radial_two_pass(q, k, v, mask_map, decay_factor, model_type,
                              block_q=min(block_q, 256))
        if out is not None:
            return out
    if jax.default_backend() == "tpu" and sparsity_type not in ("two_pass", "bsr"):
        from .attention import attention

        logger.info("radial_attn on TPU: serving the radial mask with dense "
                    "flash (a strict mask superset; every measured sparse "
                    "execution was slower at this scale — see radial_attention "
                    "docstring). Opt in via sparsity_type='two_pass'/'bsr'.")
        return attention("flash_attn3", q, k, v)
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
