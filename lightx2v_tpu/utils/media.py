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


def mux_avi_pcm(
    frames: np.ndarray,
    audio: np.ndarray,
    sample_rate: int,
    path: str,
    fps: int = 16,
    jpeg_quality: int = 92,
    normalize: bool = True,
) -> str:
    """Mux video + mono PCM16 audio into ONE .avi file, pure Python.

    The reference muxes audio into the mp4 with ffmpeg
    (wan_audio_runner.py:560-575); this image has no ffmpeg and mp4+AAC
    needs an encoder, so the TPU port writes a RIFF-AVI container with
    MJPG video (cv2 JPEG per frame) and interleaved PCM16 audio — no
    external codecs, playable by standard players.

    frames: (T, H, W, 3) RGB (float [-1,1] if normalize else uint8);
    audio: float waveform in [-1, 1] (or int16)."""
    import struct

    import cv2

    fr = to_uint8_frames(frames) if normalize else frames.astype(np.uint8)
    t, h, w, _ = fr.shape
    if audio.dtype != np.int16:
        audio = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    pcm = audio.tobytes()
    jpegs = []
    for f in fr:
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                               [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
        if not ok:
            raise RuntimeError("cv2.imencode failed")
        jpegs.append(buf.tobytes())

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    us_per_frame = int(round(1_000_000 / fps))
    max_jpeg = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", us_per_frame, max_jpeg * fps, 0, 0x10,  # HASINDEX
                       t, 0, 2, max_jpeg, w, h, 0, 0, 0, 0)
    # AVIStreamHeader: fccType/fccHandler, flags, prio+lang (2H),
    # init/scale/rate/start/length/bufsize/quality/samplesize (8I),
    # rcFrame (4h)
    strh_v = struct.pack("<4s4sI2H8I4h", b"vids", b"MJPG", 0, 0, 0,
                         0, 1, fps, 0, t, max_jpeg, 0xFFFFFFFF, 0,
                         0, 0, w, h)
    strf_v = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                         w * h * 3, 0, 0, 0, 0)
    # mono PCM16: one "sample" = one 2-byte frame
    bytes_sec = sample_rate * 2
    n_samples = len(pcm) // 2
    strh_a = struct.pack("<4s4sI2H8I4h", b"auds", b"\x00\x00\x00\x00", 0, 0, 0,
                         0, 1, sample_rate, 0, n_samples, bytes_sec, 0xFFFFFFFF, 2,
                         0, 0, 0, 0)
    strf_a = struct.pack("<2H2I2H", 1, 1, sample_rate, bytes_sec, 2, 16)  # WAVE_FORMAT_PCM
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
               + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)))

    # interleave: per video frame, the matching slice of audio
    movi_parts = []
    idx_entries = []
    movi_len = 0

    def emit(cc: bytes, data: bytes):
        nonlocal movi_len
        # idx1 offsets point at the chunk fourcc, relative to 'movi'
        idx_entries.append(struct.pack("<4s3I", cc, 0x10, 4 + movi_len, len(data)))
        c = chunk(cc, data)
        movi_parts.append(c)
        movi_len += len(c)

    a_off = 0
    for i, j in enumerate(jpegs):
        emit(b"00dc", j)
        a_end = min(round((i + 1) * bytes_sec / fps) & ~1, len(pcm))
        if i == len(jpegs) - 1:
            a_end = len(pcm)
        if a_end > a_off:
            emit(b"01wb", pcm[a_off:a_end])
            a_off = a_end
    movi_payload = b"".join(movi_parts)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


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
