"""Audio feature encoder for audio-driven video (S2V/audio runner).

Reference behavior: lightx2v/models/networks/wan/audio_adapter.py:371-417
(AudioAdapterPipe) runs a HF wav2vec-class model (wavlm-base-plus or the
checkpoint's ``audio_encoder`` subfolder) over the raw waveform and feeds
``last_hidden_state`` to the audio adapter; lightx2v/models/runners/wan/
wan_audio_runner.py:309 builds the matching AutoFeatureExtractor.

TPU framing: audio encoding is host-side preprocessing (like text
tokenization) — a small CPU model run once per request, off the TPU hot
path. The encoder emits one 1024-d feature per *video frame* (resampled
from the model's 50 Hz output; base models' 768-d states are zero-padded
to 1024), which is what models/wan/audio_adapter.py projects per latent
frame. Without a checkpoint, a deterministic waveform-envelope fallback
keeps the pipeline runnable (synthetic mode).
"""

from __future__ import annotations

import os
import wave
from typing import Optional

import numpy as np

FEAT_DIM = 1024
ENCODER_HZ = 50.0  # wav2vec-family output rate


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Mono fp32 waveform + sample rate (stdlib; no soundfile in image)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            raw = raw.reshape(-1, w.getnchannels()).mean(-1)
    return raw, sr


def resample_linear(x: np.ndarray, sr: int, target_sr: int = 16000) -> np.ndarray:
    if sr == target_sr:
        return x
    n_out = int(round(len(x) * target_sr / sr))
    return np.interp(np.linspace(0.0, len(x) - 1.0, n_out), np.arange(len(x)), x).astype(np.float32)


def envelope_features(waveform: np.ndarray, sr: int, num_frames: int, fps: float = 16.0,
                      feat_dim: int = FEAT_DIM) -> np.ndarray:
    """Frame-aligned stand-in features from the waveform envelope."""
    per_frame = max(1, int(sr / fps))
    feats = np.zeros((num_frames, feat_dim), np.float32)
    for i in range(num_frames):
        seg = waveform[i * per_frame : (i + 1) * per_frame]
        if len(seg):
            env = np.abs(seg)
            bins = np.array_split(env, feat_dim)
            feats[i] = [b.mean() if len(b) else 0.0 for b in bins]
    return feats[None]


def _interp_time(feats: np.ndarray, num_frames: int) -> np.ndarray:
    """(T, D) -> (num_frames, D) linear resample along time."""
    t_in = feats.shape[0]
    if t_in == num_frames:
        return feats
    src = np.linspace(0.0, t_in - 1.0, num_frames)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, t_in - 1)
    w = (src - lo)[:, None].astype(np.float32)
    return feats[lo] * (1.0 - w) + feats[hi] * w


class AudioEncoder:
    """wav file -> (1, num_frames, 1024) features.

    ``model_path``: HF repo dir with an ``audio_encoder`` subfolder (or a
    direct model dir). None -> envelope fallback.
    """

    def __init__(self, model_path: Optional[str] = None):
        self.model = None
        self.extractor = None
        if model_path:
            sub = os.path.join(model_path, "audio_encoder")
            repo = sub if os.path.isdir(sub) else model_path
            import torch  # noqa: F401  (CPU-only in this image)
            from transformers import AutoFeatureExtractor, AutoModel

            self.extractor = AutoFeatureExtractor.from_pretrained(repo)
            self.model = AutoModel.from_pretrained(repo).eval()

    def infer(self, audio_path: str, num_frames: int, fps: float = 16.0) -> np.ndarray:
        waveform, sr = read_wav(audio_path)
        return self.infer_array(waveform, sr, num_frames, fps=fps)

    def infer_array(self, waveform: np.ndarray, sr: int, num_frames: int,
                    fps: float = 16.0) -> np.ndarray:
        if self.model is None:
            return envelope_features(waveform, sr, num_frames, fps=fps)
        import torch

        wav16 = resample_linear(waveform, sr, 16000)
        # trim/pad to the window covering the video (reference computes
        # audio_length = 50/fps * frames on the 50 Hz feature grid)
        need = int(round(16000 * num_frames / fps))
        wav16 = np.pad(wav16[:need], (0, max(0, need - len(wav16))))
        inputs = self.extractor(wav16, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            hidden = self.model(**inputs).last_hidden_state[0].numpy()  # (T50, D)
        if hidden.shape[-1] < FEAT_DIM:
            hidden = np.pad(hidden, ((0, 0), (0, FEAT_DIM - hidden.shape[-1])))
        return _interp_time(hidden.astype(np.float32), num_frames)[None]
