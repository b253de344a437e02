"""Video/image IO and seeding (reference: lightx2v/utils/utils.py:14-96)."""

from __future__ import annotations

import os
import random
import time
from typing import Optional

import numpy as np

from .logging_utils import logger


def seed_all(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed % (2**32))


def to_uint8_frames(video: np.ndarray) -> np.ndarray:
    """(T, H, W, C) float in [-1, 1] -> uint8."""
    video = np.clip((video + 1.0) / 2.0, 0.0, 1.0)
    return (video * 255.0 + 0.5).astype(np.uint8)


def cache_video(
    video: np.ndarray,
    save_path: str,
    fps: int = 16,
    normalize: bool = True,
    retry: int = 5,
) -> Optional[str]:
    """Write (T, H, W, C) frames to mp4, with the reference's retry loop
    (reference: utils/utils.py:72-95)."""
    frames = to_uint8_frames(video) if normalize else video.astype(np.uint8)
    error = None
    for _ in range(retry):
        try:
            _write_mp4(frames, save_path, fps)
            return save_path
        except Exception as e:  # pragma: no cover - io errors
            error = e
            time.sleep(0.5)
    logger.error(f"cache_video failed, error: {error}")
    return None


def _write_mp4(frames: np.ndarray, path: str, fps: int) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import imageio

        with imageio.get_writer(path, fps=fps, codec="libx264", quality=8) as w:
            for frame in frames:
                w.append_data(frame)
        return
    except Exception:
        pass
    # Fallback: OpenCV writer
    import cv2

    t, h, wd, _ = frames.shape
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (wd, h))
    if not vw.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    for frame in frames:
        vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    vw.release()


def save_videos_grid(videos: np.ndarray, path: str, fps: int = 16, rescale: bool = True) -> None:
    """(B, T, H, W, C) -> grid mp4 (reference: utils/utils.py:25-49)."""
    if videos.ndim == 4:
        videos = videos[None]
    b, t, h, w, c = videos.shape
    ncols = int(np.ceil(np.sqrt(b)))
    nrows = int(np.ceil(b / ncols))
    grid = np.zeros((t, nrows * h, ncols * w, c), dtype=videos.dtype)
    for i in range(b):
        r, cl = divmod(i, ncols)
        grid[:, r * h : (r + 1) * h, cl * w : (cl + 1) * w] = videos[i]
    cache_video(grid, path, fps=fps, normalize=rescale)


def load_image(path: str) -> np.ndarray:
    """Load an RGB image as float32 in [-1, 1], shape (H, W, 3)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return img / 127.5 - 1.0
