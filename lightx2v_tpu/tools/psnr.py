"""PSNR harness: compare generated frames against reference output.

BASELINE.md's north star is PSNR >= 35 dB vs reference frames. This tool
makes that check runnable the moment real checkpoints/reference videos
exist:

    python -m lightx2v_tpu.tools.psnr --ours out.mp4 --ref ref.mp4
    python -m lightx2v_tpu.tools.psnr --ours lat.npy --ref ref_lat.npy

and programmatically (tests/test_reference_equivalence.py uses the same
math at tiny scale). Reads .mp4 via cv2 (imageio has no ffmpeg backend in
this image), .npy/.npz directly.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def psnr(ref: np.ndarray, got: np.ndarray, data_range: Optional[float] = None) -> float:
    """Peak signal-to-noise ratio in dB. ``data_range`` defaults to 255 for
    uint8 inputs and ref.max()-ref.min() otherwise."""
    ref = np.asarray(ref)
    got = np.asarray(got)
    if ref.shape != got.shape:
        raise ValueError(f"shape mismatch: {ref.shape} vs {got.shape}")
    if data_range is None:
        data_range = 255.0 if ref.dtype == np.uint8 else float(ref.max() - ref.min())
    mse = np.mean(np.square(ref.astype(np.float64) - got.astype(np.float64)))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range * data_range / mse))


def per_frame_psnr(ref: np.ndarray, got: np.ndarray) -> List[float]:
    """PSNR per frame for (T, H, W, C) videos."""
    return [psnr(r, g, data_range=255.0 if ref.dtype == np.uint8 else None)
            for r, g in zip(ref, got)]


def load_frames(path: str) -> np.ndarray:
    """(T, H, W, C) uint8/float from .mp4 (cv2), .npy, or .npz['frames']."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        return np.load(path)["frames"]
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="PSNR vs reference frames")
    ap.add_argument("--ours", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--min_db", type=float, default=35.0,
                    help="pass threshold (BASELINE.md: 35 dB)")
    args = ap.parse_args(argv)

    ref = load_frames(args.ref)
    got = load_frames(args.ours)
    t = min(len(ref), len(got))
    per = per_frame_psnr(ref[:t], got[:t])
    overall = psnr(ref[:t], got[:t])
    print(f"frames={t} overall_psnr={overall:.2f} dB  "
          f"min={min(per):.2f}  mean={float(np.mean(per)):.2f}")
    ok = overall >= args.min_db
    print("PASS" if ok else f"FAIL (< {args.min_db} dB)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
