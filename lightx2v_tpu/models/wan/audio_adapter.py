"""Audio adapter: per-block Perceiver cross-attention injection.

Reference: lightx2v/models/networks/wan/audio_adapter.py — audio features
(wav2vec-class, 1024-d) are projected to per-latent-frame token groups
(AudioProjection :147-190), and every ``interval``-th DiT block adds a
gated Perceiver cross-attention from the video tokens (queries, grouped
per latent frame) to that frame's audio tokens (PerceiverAttentionCA
:97-146), with an AdaLN shift/scale/gate from the timestep embedding.

Simplifications vs the reference (tracked gaps): the AudioProjection's
optional transformer-decoder refiner is an MLP-only projection here, and
attention is per-frame dense (each frame's queries attend its own audio
tokens) instead of varlen-packed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import layer_norm

Params = Dict[str, Any]


def perceiver_ca(p: Params, audio_tokens: jnp.ndarray, latents: jnp.ndarray,
                 t_emb: jnp.ndarray, heads: int = 16) -> jnp.ndarray:
    """audio_tokens (B, F, A, kv_dim); latents (B, F, T, D) video tokens
    grouped per latent frame; t_emb (B, 3, D) adaLN params. -> delta (B,F,T,D)."""
    b, f, a, kv_dim = audio_tokens.shape
    d = latents.shape[-1]
    hd = d // heads
    kv = layer_norm(audio_tokens, p["norm_kv"]["w"], p["norm_kv"]["b"], eps=1e-5)
    ssg = t_emb + p["shift_scale_gate"].astype(jnp.float32)
    shift, scale, gate = ssg[:, 0], ssg[:, 1], ssg[:, 2]
    q_in = layer_norm(latents, p["norm_q"].get("w"), p["norm_q"].get("b"), eps=1e-5)
    q_in = q_in * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    q = (jax.lax.dot_general(q_in.astype(jnp.bfloat16), p["to_q"]["w"], (((3,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) + p["to_q"]["b"]).astype(jnp.bfloat16)
    kvp = (jax.lax.dot_general(kv.astype(jnp.bfloat16), p["to_kv"]["w"], (((3,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) + p["to_kv"]["b"]).astype(jnp.bfloat16)
    k, v = jnp.split(kvp, 2, axis=-1)
    t = latents.shape[2]
    qh = q.reshape(b, f, t, heads, hd)
    kh = k.reshape(b, f, a, heads, hd)
    vh = v.reshape(b, f, a, heads, hd)
    logits = jnp.einsum("bftnd,bfand->bfnta", qh, kh, preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bfnta,bfand->bftnd", probs, vh).reshape(b, f, t, d)
    out = (jax.lax.dot_general(out, p["to_out"]["w"], (((3,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) + p["to_out"]["b"])
    return out * gate[:, None, None, :]


def audio_projection(p: Params, features: jnp.ndarray, latent_frames: int,
                     num_tokens: int = 32) -> jnp.ndarray:
    """(B, T_video, feat_dim) frame-aligned audio features ->
    (B, latent_frames, num_tokens, token_dim). Neighbor stacking (2 left /
    2 right) + MLP, per the reference AudioProjection (MLP path)."""
    b, tv, fd = features.shape
    left, right = 2, 2
    padded = jnp.pad(features, ((0, 0), (left, right), (0, 0)), mode="edge")
    stacked = jnp.concatenate([padded[:, i : i + tv] for i in range(left + right + 1)], axis=-1)
    h = stacked.astype(jnp.bfloat16)
    for i, layer in enumerate(p["mlp"]):
        h = jax.lax.dot_general(h, layer["w"], (((2,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + layer["b"]
        if i != len(p["mlp"]) - 1:
            h = jax.nn.relu(h)
        h = h.astype(jnp.bfloat16)
    # (B, T_video, num_tokens*token_dim) -> group video frames per latent
    # frame: frame 0 alone, then 4 per latent frame
    token_dim = h.shape[-1] // num_tokens
    h = h.reshape(b, tv, num_tokens, token_dim)
    first = h[:, :1]
    rest = h[:, 1:].reshape(b, latent_frames - 1, 4 * num_tokens, token_dim) if latent_frames > 1 else None
    first = jnp.pad(first, ((0, 0), (0, 0), (0, 3 * num_tokens), (0, 0)))
    groups = jnp.concatenate([first, rest], axis=1) if rest is not None else first
    out = layer_norm(groups, p["norm"]["w"], p["norm"]["b"], eps=1e-5)
    return out.astype(jnp.bfloat16)


def init_random_audio_adapter(dim: int = 1536, kv_dim: int = 768, feat_dim: int = 1024,
                              num_layers: int = 30, interval: int = 1, heads: int = 16,
                              num_tokens: int = 4, seed: int = 0, scale: float = 0.02) -> Params:
    rng = np.random.default_rng(seed)
    r = lambda *s: (rng.standard_normal(s) * scale).astype(np.float32)

    def lin(i, o):
        return {"w": r(o, i), "b": np.zeros(o, np.float32)}

    n_inject = max(1, num_layers // interval)
    ca = []
    for _ in range(n_inject):
        ssg = np.zeros((3, dim), np.float32)
        ssg[2] = 1.0
        ca.append({
            "norm_kv": {"w": np.ones(kv_dim, np.float32), "b": np.zeros(kv_dim, np.float32)},
            "norm_q": {"w": np.ones(dim, np.float32), "b": np.zeros(dim, np.float32)},
            "to_q": lin(dim, dim),
            "to_kv": lin(kv_dim, 2 * dim),
            "to_out": lin(dim, dim),
            "shift_scale_gate": ssg,
        })
    token_dim = kv_dim
    params = {
        "ca_blocks": jax.tree_util.tree_map(lambda *ls: np.stack(ls), *ca),
        "proj": {
            "mlp": [lin(feat_dim * 5, 1024), lin(1024, 1024), lin(1024, num_tokens * token_dim)],
            "norm": {"w": np.ones(token_dim, np.float32), "b": np.zeros(token_dim, np.float32)},
        },
        "interval": interval,
        "num_tokens": num_tokens,
        "heads": heads,
    }
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params)
