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


# ---------------------------------------------------------------- mp4 a/v mux


def _walk_boxes(buf, start, end):
    """Minimal independent ISO-BMFF box walker -> [(fourcc, payload_start,
    payload_end)] at one nesting level."""
    import struct

    out = []
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", buf[i:i + 4])[0]
        out.append((buf[i + 4:i + 8], i + 8, i + size))
        i += size
    return out


def test_mux_mp4_video_track_decodes(tmp_path):
    """cv2 (libavformat) must demux + decode the MJPEG video track of the
    hand-built mp4 — an independent demuxer validating the container."""
    cv2 = pytest.importorskip("cv2")
    from lightx2v_tpu.utils.media import mux_mp4_pcm

    # smooth gradient pattern (JPEG-friendly; noise would swamp the
    # lossy-fidelity check below)
    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    base = np.stack([xx / 95, yy / 63, (xx + yy) / 158], axis=-1) * 2 - 1
    frames = np.stack([np.roll(base, 3 * i, axis=1) for i in range(12)])
    sr = 8000
    audio = np.sin(np.linspace(0, 2 * np.pi * 330 * 0.75, int(sr * 0.75))).astype(np.float32)
    p = mux_mp4_pcm(frames, audio, sr, str(tmp_path / "av.mp4"), fps=16)
    cap = cv2.VideoCapture(p)
    n = 0
    first = None
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        if first is None:
            first = fr
        n += 1
    assert n == 12
    assert first.shape == (64, 96, 3)
    assert cap.get(cv2.CAP_PROP_FPS) == 16.0
    # decoded JPEG ~ original frame (lossy bound)
    want = np.clip((frames[0] + 1) / 2 * 255 + 0.5, 0, 255).astype(np.uint8)
    got = cv2.cvtColor(first, cv2.COLOR_BGR2RGB)
    assert np.abs(got.astype(float) - want.astype(float)).mean() < 12


def test_mux_mp4_audio_track_recoverable(tmp_path):
    """The sowt track's stco/stsz must index PCM bytes that round-trip
    bit-exactly (what any demuxer does to play the audio)."""
    import struct

    from lightx2v_tpu.utils.media import mux_mp4_pcm

    frames = _frames(t=4)
    audio = ((np.arange(5000) % 512) - 256).astype(np.int16)
    p = mux_mp4_pcm(frames, audio, 16000, str(tmp_path / "av.mp4"), fps=16)
    raw = open(p, "rb").read()

    top = {cc: (a, b) for cc, a, b in _walk_boxes(raw, 0, len(raw))}
    assert set(top) >= {b"ftyp", b"mdat", b"moov"}
    moov = _walk_boxes(raw, *top[b"moov"])
    traks = [(a, b) for cc, a, b in moov if cc == b"trak"]
    assert len(traks) == 2
    # find the audio trak (contains 'sowt') and read its stsz/stco
    audio_trak = next((a, b) for a, b in traks if b"sowt" in raw[a:b])
    a, b = audio_trak
    j = raw.index(b"stsz", a, b)
    _vf, sz, n = struct.unpack(">III", raw[j + 4:j + 16])
    k = raw.index(b"stco", a, b)
    _vf2, n_chunks, off = struct.unpack(">III", raw[k + 4:k + 16])
    assert sz == 2 and n == 5000 and n_chunks == 1
    pcm = raw[off:off + sz * n]
    np.testing.assert_array_equal(np.frombuffer(pcm, "<i2"), audio)
    # PCM must live inside mdat
    assert top[b"mdat"][0] <= off and off + sz * n <= top[b"mdat"][1]
