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


def audio_time_embedding(p: Params, t: jnp.ndarray, freq_dim: int = 256) -> jnp.ndarray:
    """timestep (B,) -> (B, 3, D) adaLN shift/scale/gate source (reference
    TimeEmbedding, audio_adapter.py:193-211: diffusers Timesteps with
    flip_sin_to_cos=True, downscale_freq_shift=0 -> linear/silu/linear ->
    silu -> time_proj)."""
    half = freq_dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # flip_sin_to_cos
    h = jax.lax.dot_general(emb, p["linear_1"]["w"], (((1,), (1,)), ((), ()))) + p["linear_1"]["b"]
    h = jax.lax.dot_general(jax.nn.silu(h), p["linear_2"]["w"], (((1,), (1,)), ((), ()))) + p["linear_2"]["b"]
    out = jax.lax.dot_general(jax.nn.silu(h), p["time_proj"]["w"], (((1,), (1,)), ((), ()))) + p["time_proj"]["b"]
    return out.reshape(t.shape[0], 3, -1)


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
    # frame 0 is repeated 4x (reference rearange_audio_features,
    # audio_adapter.py:256-262), not padded
    first = jnp.tile(first, (1, 1, 4, 1))
    groups = jnp.concatenate([first, rest], axis=1) if rest is not None else first
    out = layer_norm(groups, p["norm"]["w"], p["norm"]["b"], eps=1e-5)
    if "audio_pe" in p:  # learned positional embedding over the 4x token group
        out = out + p["audio_pe"].astype(out.dtype)
    return out.astype(jnp.bfloat16)


def load_audio_adapter(sd: Dict[str, np.ndarray], interval: int = 1, heads: Optional[int] = None) -> Params:
    """Convert a reference audio-adapter state dict (torch tensors or numpy,
    keys per audio_adapter.py:216-260: ``audio_proj.mlp.{0,2,4}``,
    ``audio_proj.norm``, ``audio_pe``, ``ca.{i}.{norm_kv,to_q,to_kv,to_out,
    shift_scale_gate}``, ``time_embedding.{time_embedder.linear_1/2,
    time_proj}``) into this module's pytree. Weights keep torch (out, in)
    layout (NT matmuls). The AudioProjection transformer-decoder refiner
    keys are skipped (documented divergence: MLP-only projection)."""

    def a(key):
        v = sd[key]
        return np.asarray(v.float().numpy() if hasattr(v, "numpy") else v, np.float32)

    def lin(prefix):
        return {"w": a(f"{prefix}.weight"), "b": a(f"{prefix}.bias")}

    n_inject = 0
    while f"ca.{n_inject}.to_q.weight" in sd:
        n_inject += 1
    assert n_inject > 0, "no ca.* blocks in audio adapter state dict"
    ca = []
    for i in range(n_inject):
        blk = {
            "norm_kv": {"w": a(f"ca.{i}.norm_kv.weight"), "b": a(f"ca.{i}.norm_kv.bias")},
            # adaLN variant: norm_q has no affine params (elementwise_affine=False)
            "norm_q": {},
            "to_q": lin(f"ca.{i}.to_q"),
            "to_kv": lin(f"ca.{i}.to_kv"),
            "to_out": lin(f"ca.{i}.to_out"),
            "shift_scale_gate": a(f"ca.{i}.shift_scale_gate").reshape(3, -1),
        }
        if f"ca.{i}.norm_q.weight" in sd:
            blk["norm_q"] = {"w": a(f"ca.{i}.norm_q.weight"), "b": a(f"ca.{i}.norm_q.bias")}
        ca.append(blk)

    dim = ca[0]["to_q"]["w"].shape[0]
    params: Params = {
        "ca_blocks": jax.tree_util.tree_map(lambda *ls: np.stack(ls), *ca),
        "proj": {
            "mlp": [lin("audio_proj.mlp.0"), lin("audio_proj.mlp.2"), lin("audio_proj.mlp.4")],
            "norm": {"w": a("audio_proj.norm.weight"), "b": a("audio_proj.norm.bias")},
        },
        "interval": interval,
        "heads": heads if heads is not None else dim // 128,
    }
    if "audio_pe" in sd:
        params["proj"]["audio_pe"] = a("audio_pe")
    params["num_tokens"] = params["proj"]["mlp"][-1]["w"].shape[0] // params["proj"]["norm"]["w"].shape[0]
    if "time_embedding.time_proj.weight" in sd:
        params["time_embedding"] = {
            "linear_1": lin("time_embedding.time_embedder.linear_1"),
            "linear_2": lin("time_embedding.time_embedder.linear_2"),
            "time_proj": lin("time_embedding.time_proj"),
        }
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params)


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
