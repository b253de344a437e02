"""CLIP ViT-H/14 vision tower (Wan i2v image conditioning).

Reference: lightx2v/models/input_encoders/hf/xlm_roberta/model.py —
open-clip XLM-RoBERTa-CLIP's visual transformer: patch conv (14x14, no
bias), cls token, learned positional embedding, pre-LN, 32 pre-norm
blocks with gelu MLP; Wan uses the FIRST 31 blocks' output over all
257 tokens (use_31_block=True, :446).

JAX structure: blocks stacked + lax.scan; inputs resized to 224 bicubic
and CLIP-normalized on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm

Params = Dict[str, Any]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class ClipVisionArch:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    use_blocks: int = 31  # Wan i2v stops one block early
    norm_eps: float = 1e-5


def _lin(w, x, b=None):
    """(out, in) matmul; quantized weights (reference q_linear.py) arrive as
    {"w": int8/fp8, "w_scale": fp32} dicts and take the w8a8 MXU path."""
    if isinstance(w, dict):
        from ..ops.linear import resolve_mm

        scheme = "int8" if w["w"].dtype == jnp.int8 else "fp8"
        fn = resolve_mm(f"W-{scheme}-channel-sym-A-{scheme}-channel-sym-dynamic-Tpu")
        y = fn({"w": w["w"], "w_scale": w["w_scale"], "b": None}, x)
    else:
        y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


def clip_vision_forward(params: Params, pixels: jnp.ndarray, arch: ClipVisionArch) -> jnp.ndarray:
    """pixels: (B, H, W, 3) CLIP-normalized -> (B, 1+num_patches, dim)."""
    b = pixels.shape[0]
    p = arch.patch_size
    x = pixels.astype(jnp.bfloat16)
    # patch conv (no bias, stride==kernel) as reshape+matmul
    x = x.reshape(b, arch.image_size // p, p, arch.image_size // p, p, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, -1, 3 * p * p)
    x = jax.lax.dot_general(x, params["patch"], (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (b, 1, arch.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"].astype(x.dtype)
    x = layer_norm(x, params["pre_norm"]["w"], params["pre_norm"]["b"], eps=arch.norm_eps)

    n, hd = arch.num_heads, arch.dim // arch.num_heads

    def block(carry, bp):
        h = layer_norm(carry, bp["norm1"]["w"], bp["norm1"]["b"], eps=arch.norm_eps)
        qkv = _lin(bp["qkv_w"], h, bp["qkv_b"]).astype(h.dtype)
        q, k, v = [t.reshape(b, -1, n, hd) for t in jnp.split(qkv, 3, axis=-1)]
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, -1, arch.dim)
        attn = _lin(bp["proj_w"], attn, bp["proj_b"]).astype(h.dtype)
        x2 = carry + attn
        h = layer_norm(x2, bp["norm2"]["w"], bp["norm2"]["b"], eps=arch.norm_eps)
        h = _lin(bp["fc1_w"], h, bp["fc1_b"])
        h = jax.nn.gelu(h, approximate=False).astype(x2.dtype)
        h = _lin(bp["fc2_w"], h, bp["fc2_b"]).astype(x2.dtype)
        return x2 + h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return x


def load_clip_vision_params(sd: Dict[str, np.ndarray], arch: ClipVisionArch, dtype=None) -> Params:
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16
    g = lambda k: np.asarray(sd[k])

    pe = g("visual.patch_embedding.weight")  # (D, 3, p, p)
    params: Params = {
        "patch": pe.reshape(pe.shape[0], -1).astype(dtype),
        "cls": g("visual.cls_embedding").reshape(1, arch.dim).astype(np.float32),
        "pos": g("visual.pos_embedding").reshape(-1, arch.dim).astype(np.float32),
        "pre_norm": {"w": g("visual.pre_norm.weight").astype(np.float32),
                     "b": g("visual.pre_norm.bias").astype(np.float32)},
    }

    def blk(i):
        p = f"visual.transformer.{i}"
        return {
            "norm1": {"w": g(f"{p}.norm1.weight").astype(np.float32), "b": g(f"{p}.norm1.bias").astype(np.float32)},
            "qkv_w": g(f"{p}.attn.to_qkv.weight").astype(dtype),
            "qkv_b": g(f"{p}.attn.to_qkv.bias").astype(np.float32),
            "proj_w": g(f"{p}.attn.proj.weight").astype(dtype),
            "proj_b": g(f"{p}.attn.proj.bias").astype(np.float32),
            "norm2": {"w": g(f"{p}.norm2.weight").astype(np.float32), "b": g(f"{p}.norm2.bias").astype(np.float32)},
            "fc1_w": g(f"{p}.mlp.0.weight").astype(dtype),
            "fc1_b": g(f"{p}.mlp.0.bias").astype(np.float32),
            "fc2_w": g(f"{p}.mlp.2.weight").astype(dtype),
            "fc2_b": g(f"{p}.mlp.2.bias").astype(np.float32),
        }

    blocks = [blk(i) for i in range(arch.use_blocks)]
    params["blocks"] = jax.tree_util.tree_map(lambda *ls: np.stack(ls), *blocks)
    return jax.tree_util.tree_map(jnp.asarray, params)


def quantize_clip_params(params: Params, scheme: str = "int8") -> Params:
    """Quantize the vision tower's matmul weights per output channel
    (reference q_linear.py path, as for the T5 encoder)."""
    from ..tools.convert import quantize_tensor

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("qkv_w", "proj_w", "fc1_w", "fc2_w"):
        w = np.asarray(blocks[name], np.float32)  # (L, out, in)
        qs, scales = [], []
        for i in range(w.shape[0]):
            qi, si = quantize_tensor(w[i], scheme)
            qs.append(qi)
            scales.append(si)
        blocks[name] = {"w": jnp.asarray(np.stack(qs)), "w_scale": jnp.asarray(np.stack(scales))}
    out["blocks"] = blocks
    return out


def preprocess_image(img: np.ndarray, image_size: int = 224) -> np.ndarray:
    """(H, W, 3) float in [-1, 1] -> (1, S, S, 3) CLIP-normalized (bicubic
    resize as the reference transforms, :444-445)."""
    import cv2

    x = (img.astype(np.float32) + 1.0) / 2.0
    x = cv2.resize(x, (image_size, image_size), interpolation=cv2.INTER_CUBIC)
    x = (x - CLIP_MEAN) / CLIP_STD
    return x[None]


class CLIPVisionModel:
    """User-facing wrapper (reference CLIPModel.visual, :436-449)."""

    def __init__(self, checkpoint_path: Optional[str] = None, arch: ClipVisionArch = ClipVisionArch(),
                 params: Optional[Params] = None):
        self.arch = arch
        if params is not None:
            self.params = params
        else:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
            sd = {k: (v.float().numpy() if v.dtype in (torch.bfloat16, torch.float16) else v.numpy())
                  for k, v in sd.items() if "textual" not in k}
            self.params = load_clip_vision_params(sd, arch)
        import functools

        self._fwd = jax.jit(functools.partial(clip_vision_forward, arch=arch))

    def infer(self, img: np.ndarray) -> jnp.ndarray:
        """img (H, W, 3) in [-1, 1] -> (1, 257, dim) tokens."""
        return self._fwd(self.params, jnp.asarray(preprocess_image(img, self.arch.image_size)))


# ---------------------------------------------------------------------------
# CLIP-L TEXT tower (Hunyuan's second text encoder: pooled prompt vector).
# Reference: lightx2v/models/input_encoders/hf/clip/model.py — HF
# CLIPTextModel, max_length 77, returns pooler_output (the eot token's
# hidden state after the final LayerNorm). Same JAX structure as the
# vision tower: stacked blocks + lax.scan, causal+padding mask,
# quick-gelu MLP.

@dataclass(frozen=True)
class ClipTextArch:
    vocab_size: int = 49408
    dim: int = 768
    mlp_ratio: int = 4
    num_heads: int = 12
    num_layers: int = 12
    max_positions: int = 77
    norm_eps: float = 1e-5


def clip_text_forward(params: Params, ids: jnp.ndarray, mask: jnp.ndarray,
                      arch: ClipTextArch):
    """ids, mask: (B, L<=77) -> (last_hidden (B, L, D) bf16,
    pooled (B, D) f32 = eot-token row of the final-LN output)."""
    b, L = ids.shape
    x = params["token_embedding"][ids].astype(jnp.bfloat16)
    x = x + params["pos"][:L].astype(x.dtype)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((L, L), bool))
    keep = causal[None, None] & (mask[:, None, None, :] > 0)
    bias = jnp.where(keep, 0.0, neg).astype(jnp.float32)
    n, hd = arch.num_heads, arch.dim // arch.num_heads

    def block(carry, bp):
        h = layer_norm(carry, bp["norm1"]["w"], bp["norm1"]["b"], eps=arch.norm_eps)
        q = (_lin(bp["q_w"], h, bp["q_b"]) / np.sqrt(hd)).astype(h.dtype).reshape(b, L, n, hd)
        k = _lin(bp["k_w"], h, bp["k_b"]).astype(h.dtype).reshape(b, L, n, hd)
        v = _lin(bp["v_w"], h, bp["v_b"]).astype(h.dtype).reshape(b, L, n, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, L, arch.dim)
        x2 = carry + _lin(bp["proj_w"], attn, bp["proj_b"]).astype(h.dtype)
        h = layer_norm(x2, bp["norm2"]["w"], bp["norm2"]["b"], eps=arch.norm_eps)
        h = _lin(bp["fc1_w"], h, bp["fc1_b"]).astype(jnp.float32)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        h = _lin(bp["fc2_w"], h.astype(x2.dtype), bp["fc2_b"]).astype(x2.dtype)
        return x2 + h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"],
                   eps=arch.norm_eps)
    # pooled = eot row; CLIP's eot (49407) is the vocabulary's highest id,
    # so argmax over ids finds it (original-CLIP convention HF mirrors)
    eot = jnp.argmax(ids, axis=-1)
    pooled = x[jnp.arange(b), eot].astype(jnp.float32)
    return x.astype(jnp.bfloat16), pooled


def load_clip_text_params(sd: Dict[str, np.ndarray], arch: ClipTextArch, dtype=None) -> Params:
    """HF CLIPTextModel state_dict (text_model.-prefixed) -> pytree."""
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16
    g = lambda k: np.asarray(sd[f"text_model.{k}"])

    params: Params = {
        "token_embedding": g("embeddings.token_embedding.weight").astype(dtype),
        "pos": g("embeddings.position_embedding.weight").astype(np.float32),
        "final_norm": {"w": g("final_layer_norm.weight").astype(np.float32),
                       "b": g("final_layer_norm.bias").astype(np.float32)},
    }

    def blk(i):
        p = f"encoder.layers.{i}"
        out = {}
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                             ("proj", "out_proj")):
            out[f"{ours}_w"] = g(f"{p}.self_attn.{theirs}.weight").astype(dtype)
            out[f"{ours}_b"] = g(f"{p}.self_attn.{theirs}.bias").astype(np.float32)
        for ours, theirs in (("norm1", "layer_norm1"), ("norm2", "layer_norm2")):
            out[ours] = {"w": g(f"{p}.{theirs}.weight").astype(np.float32),
                         "b": g(f"{p}.{theirs}.bias").astype(np.float32)}
        for ours, theirs in (("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            out[f"{ours}_w"] = g(f"{p}.{theirs}.weight").astype(dtype)
            out[f"{ours}_b"] = g(f"{p}.{theirs}.bias").astype(np.float32)
        return out

    blocks = [blk(i) for i in range(arch.num_layers)]
    params["blocks"] = jax.tree_util.tree_map(lambda *ls: np.stack(ls), *blocks)
    return jax.tree_util.tree_map(jnp.asarray, params)


def quantize_clip_text_params(params: Params, scheme: str = "int8") -> Params:
    from ..tools.convert import quantize_tensor

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("q_w", "k_w", "v_w", "proj_w", "fc1_w", "fc2_w"):
        w = np.asarray(blocks[name], np.float32)
        qs, scales = [], []
        for i in range(w.shape[0]):
            qi, si = quantize_tensor(w[i], scheme)
            qs.append(qi)
            scales.append(si)
        blocks[name] = {"w": jnp.asarray(np.stack(qs)), "w_scale": jnp.asarray(np.stack(scales))}
    out["blocks"] = blocks
    return out


def init_random_clip_text_params_on_device(arch: ClipTextArch = ClipTextArch(),
                                           seed: int = 0, scale: float = 0.02) -> Params:
    """Device-synthesized CLIP-L text params (bench path; CLIP-L is small
    enough that quantization is never needed for capacity)."""
    import itertools

    import jax.random as jr

    L, d = arch.num_layers, arch.dim
    cnt = itertools.count()

    def build(base):
        def nrm(shape, dtype=jnp.bfloat16, std=scale):
            return jr.normal(jr.fold_in(base, next(cnt)), shape, dtype) * jnp.asarray(std, dtype)

        blocks: Params = {
            "norm1": {"w": jnp.ones((L, d), jnp.float32), "b": jnp.zeros((L, d), jnp.float32)},
            "norm2": {"w": jnp.ones((L, d), jnp.float32), "b": jnp.zeros((L, d), jnp.float32)},
        }
        for nm, (o, i) in (("q", (d, d)), ("k", (d, d)), ("v", (d, d)), ("proj", (d, d)),
                           ("fc1", (arch.mlp_ratio * d, d)), ("fc2", (d, arch.mlp_ratio * d))):
            blocks[f"{nm}_w"] = nrm((L, o, i))
            blocks[f"{nm}_b"] = jnp.zeros((L, o), jnp.float32)
        return {
            "token_embedding": nrm((arch.vocab_size, d)),
            "pos": nrm((arch.max_positions, d), jnp.float32),
            "blocks": blocks,
            "final_norm": {"w": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)},
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


class CLIPTextModel:
    """User-facing wrapper (reference TextEncoderHFClipModel.infer):
    tokenize to 77 -> pooled prompt vector."""

    def __init__(self, arch: ClipTextArch = ClipTextArch(),
                 params: Optional[Params] = None, tokenizer=None):
        import functools

        self.arch = arch
        self.params = params
        self.tokenizer = tokenizer
        self._fwd = jax.jit(functools.partial(clip_text_forward, arch=arch))

    def infer(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer(texts, return_mask=True)
        _, pooled = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return pooled


def init_random_clip_state_dict(arch: ClipVisionArch, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    d = arch.dim
    sd["visual.patch_embedding.weight"] = rng.standard_normal((d, 3, arch.patch_size, arch.patch_size), dtype=np.float32) * scale
    sd["visual.cls_embedding"] = rng.standard_normal((1, 1, d), dtype=np.float32) * scale
    npatch = (arch.image_size // arch.patch_size) ** 2
    sd["visual.pos_embedding"] = rng.standard_normal((1, npatch + 1, d), dtype=np.float32) * scale
    sd["visual.pre_norm.weight"] = np.ones(d, np.float32)
    sd["visual.pre_norm.bias"] = np.zeros(d, np.float32)
    for i in range(arch.num_layers):
        p = f"visual.transformer.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros(d, np.float32)
        sd[f"{p}.attn.to_qkv.weight"] = rng.standard_normal((3 * d, d), dtype=np.float32) * scale
        sd[f"{p}.attn.to_qkv.bias"] = np.zeros(3 * d, np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.standard_normal((d, d), dtype=np.float32) * scale
        sd[f"{p}.attn.proj.bias"] = np.zeros(d, np.float32)
        sd[f"{p}.mlp.0.weight"] = rng.standard_normal((arch.mlp_ratio * d, d), dtype=np.float32) * scale
        sd[f"{p}.mlp.0.bias"] = np.zeros(arch.mlp_ratio * d, np.float32)
        sd[f"{p}.mlp.2.weight"] = rng.standard_normal((d, arch.mlp_ratio * d), dtype=np.float32) * scale
        sd[f"{p}.mlp.2.bias"] = np.zeros(d, np.float32)
    return sd
