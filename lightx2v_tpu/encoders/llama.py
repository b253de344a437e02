"""Llama text encoder (llava-llama-3-8b class) in pure JAX.

Behavior matches the reference's HF-transformers wrapper
(lightx2v/models/input_encoders/hf/llama/model.py): run the decoder
stack causally over the templated prompt and return
``hidden_states[-(skip+1)]`` — i.e. the activations after
``num_layers - skip`` blocks, BEFORE the final norm (the reference uses
hidden_state_skip_layer=2) — cropped past the first ``crop_start``
template tokens (reference crop_start=95). The pooled CLIP-L text
vector that travels with it lives in ``encoders/clip.py``.

TPU structure: blocks are stacked and scanned (only the first
``num_layers - skip`` blocks are scanned — the reference discards the
top layers' work, we never do it); rope tables are precomputed
host-side for the static prompt length; int8/fp8 per-channel quantized
block linears ride the same {"w", "w_scale"} MXU path as the T5/CLIP
encoders (reference q_linear.py analog).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class LlamaArch:
    vocab_size: int = 128320  # llava-llama-3-8b (llama3 base: 128256)
    dim: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    hidden_state_skip_layer: int = 2  # reference llama/model.py:15
    crop_start: int = 95              # reference llama/model.py:16

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


LLAVA_LLAMA3_8B = LlamaArch()


def _rms_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (w.astype(jnp.float32) * out).astype(x.dtype)


def _lin(p, x):
    # (out, in) layout, bias-free (llama linears). Quantized weights
    # arrive as {"w", "w_scale"} dicts -> w8a8 MXU path (q_linear analog).
    if isinstance(p, dict):
        from ..ops.linear import resolve_mm

        if p["w"].dtype == jnp.uint8:  # nibble-packed int4 (w4a8 path)
            fn = resolve_mm("W-int4-group-sym-A-int8-token-dynamic-Tpu")
        else:
            scheme = "int8" if p["w"].dtype == jnp.int8 else "fp8"
            fn = resolve_mm(f"W-{scheme}-channel-sym-A-{scheme}-channel-sym-dynamic-Tpu")
        return fn({"w": p["w"], "w_scale": p["w_scale"], "b": None}, x)
    return jax.lax.dot_general(
        x, p, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def build_llama_rope(length: int, head_dim: int, theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """HF llama rope tables, host-side: cos/sin of shape (L, head_dim)
    with the half-dim frequencies DUPLICATED (rotate_half convention)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = np.outer(np.arange(length, dtype=np.float64), inv)  # (L, hd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    # x: (B, L, N, hd); cos/sin: (L, hd)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s).astype(x.dtype)


def llama_block(block: Params, x: jnp.ndarray, bias: jnp.ndarray,
                cos: jnp.ndarray, sin: jnp.ndarray, arch: LlamaArch) -> jnp.ndarray:
    b, L, d = x.shape
    n, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim

    h = _rms_norm(block["norm1"], x, arch.rms_eps)
    q = _lin(block["q"], h).reshape(b, L, n, hd)
    k = _lin(block["k"], h).reshape(b, L, nkv, hd)
    v = _lin(block["v"], h).reshape(b, L, nkv, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    # GQA: broadcast each kv head over n // nkv query heads
    rep = n // nkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, L, d)
    x = x + _lin(block["o"], attn)

    h = _rms_norm(block["norm2"], x, arch.rms_eps)
    gate = jax.nn.silu(_lin(block["gate"], h).astype(jnp.float32))
    y = gate * _lin(block["up"], h).astype(jnp.float32)
    x = x + _lin(block["down"], y.astype(x.dtype))
    return x


def llama_encode(params: Params, ids: jnp.ndarray, mask: jnp.ndarray,
                 arch: LlamaArch = LLAVA_LLAMA3_8B,
                 skip_layers: Optional[int] = None) -> jnp.ndarray:
    """ids, mask: (B, L) -> (B, L, dim) bf16 hidden states after
    ``num_layers - skip_layers`` blocks (NO final norm — matches HF
    ``output_hidden_states`` semantics the reference indexes into)."""
    skip = arch.hidden_state_skip_layer if skip_layers is None else skip_layers
    L = ids.shape[1]
    cos, sin = build_llama_rope(L, arch.head_dim, arch.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    x = params["token_embedding"][ids].astype(jnp.bfloat16)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((L, L), bool))
    keep = causal[None, None] & (mask[:, None, None, :] > 0)
    bias = jnp.where(keep, 0.0, neg).astype(jnp.float32)

    run = arch.num_layers - skip
    blocks = jax.tree_util.tree_map(lambda a: a[:run], params["blocks"])

    def body(carry, block):
        return llama_block(block, carry, bias, cos, sin, arch), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def llama_encode_cropped(params: Params, ids: jnp.ndarray, mask: jnp.ndarray,
                         arch: LlamaArch = LLAVA_LLAMA3_8B) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's full infer contract (llama/model.py:59-63):
    hidden states and attention mask with the first ``crop_start``
    template tokens dropped."""
    x = llama_encode(params, ids, mask, arch)
    return x[:, arch.crop_start:], mask[:, arch.crop_start:]


# ---------------------------------------------------------------------------

def load_llama_params(state_dict: Dict[str, np.ndarray], arch: LlamaArch = LLAVA_LLAMA3_8B,
                      dtype=None) -> Params:
    """HF LlamaModel state_dict (``model.``-less keys also accepted) -> pytree."""
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16
    sd = state_dict
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def w(key):
        a = np.asarray(sd[key])
        return a if a.dtype == np.dtype(dtype) else a.astype(dtype)

    def block(i):
        p = f"layers.{i}"
        return {
            "norm1": np.asarray(sd[f"{p}.input_layernorm.weight"], np.float32),
            "q": w(f"{p}.self_attn.q_proj.weight"),
            "k": w(f"{p}.self_attn.k_proj.weight"),
            "v": w(f"{p}.self_attn.v_proj.weight"),
            "o": w(f"{p}.self_attn.o_proj.weight"),
            "norm2": np.asarray(sd[f"{p}.post_attention_layernorm.weight"], np.float32),
            "gate": w(f"{p}.mlp.gate_proj.weight"),
            "up": w(f"{p}.mlp.up_proj.weight"),
            "down": w(f"{p}.mlp.down_proj.weight"),
        }

    blocks = [block(i) for i in range(arch.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *ls: np.stack(ls), *blocks)
    params = {
        "token_embedding": w("embed_tokens.weight"),
        "blocks": stacked,
        "norm": np.asarray(sd["norm.weight"], np.float32),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def quantize_llama_params(params: Params, scheme: str = "int8") -> Params:
    """Per-output-channel int8/fp8 on the nine block linears
    (reference text_encoder quantization / q_linear.py analog)."""
    from ..tools.convert import quantize_tensor

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        w = np.asarray(blocks[name], np.float32)  # (L, out, in)
        qs, scales = [], []
        for i in range(w.shape[0]):
            qi, si = quantize_tensor(w[i], scheme)
            qs.append(qi)
            scales.append(si)
        blocks[name] = {"w": jnp.asarray(np.stack(qs)),
                        "w_scale": jnp.asarray(np.stack(scales))}
    out["blocks"] = blocks
    return out


def init_random_llama_params_on_device(arch: LlamaArch = LLAVA_LLAMA3_8B,
                                       scheme: str = "bf16", seed: int = 0,
                                       scale: float = 0.02) -> Params:
    """Synthesize the stacked pytree directly on the accelerator (the 8B
    host state dict is ~32 GB f32; the tunnel moves single-digit MB/s —
    same rationale as init_random_t5_params_on_device)."""
    import itertools

    import jax.random as jr

    L, d, df = arch.num_layers, arch.dim, arch.ffn_dim
    dkv = arch.num_kv_heads * arch.head_dim
    cnt = itertools.count()

    def build(base):
        def nrm(shape, dtype=jnp.bfloat16, std=scale):
            return jr.normal(jr.fold_in(base, next(cnt)), shape, dtype) * jnp.asarray(std, dtype)

        def qlin(out, kin):
            sh, bsh = (L, out, kin), (L, out)
            key = jr.fold_in(base, next(cnt))
            if scheme == "int8":
                return {"w": jr.randint(key, sh, -127, 128, jnp.int8),
                        "w_scale": jnp.full(bsh, scale / 127.0, jnp.float32)}
            if scheme == "fp8":
                vals = jnp.clip(jr.normal(key, sh, jnp.bfloat16) * 100.0, -448.0, 448.0)
                return {"w": vals.astype(jnp.float8_e4m3fn),
                        "w_scale": jnp.full(bsh, scale / 100.0, jnp.float32)}
            if scheme == "w4a8":
                # int4 nibble-packed weights + per-(channel, group-512)
                # scales — halves the int8 footprint so the 8B encoder
                # coexists with a 13B w4a8 DiT on one 16 GB v5e (the
                # Hunyuan protocol-complete e2e peak). Group 512 matches
                # the DiT convention (int4_matmul.BK) and keeps the
                # blocked w4a8 kernel's packed block >= 128 lanes at the
                # down-projection's K=14336 (group 128 made bk//2 = 64,
                # an illegal Mosaic block — part-5 trace failure)
                group = min(512, kin)
                return {"w": jr.randint(key, (L, out, kin // 2), 0, 255, jnp.uint8),
                        "w_scale": jnp.full((L, out, kin // group),
                                            scale / 7.0, jnp.float32)}
            return nrm(sh)

        blocks: Params = {
            "norm1": jnp.ones((L, d), jnp.float32),
            "q": qlin(d, d), "k": qlin(dkv, d), "v": qlin(dkv, d), "o": qlin(d, d),
            "norm2": jnp.ones((L, d), jnp.float32),
            "gate": qlin(df, d), "up": qlin(df, d), "down": qlin(d, df),
        }
        return {
            "token_embedding": nrm((arch.vocab_size, d)),
            "blocks": blocks,
            "norm": jnp.ones(d, jnp.float32),
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


class LlamaEncoderModel:
    """User-facing wrapper mirroring the reference TextEncoderHFLlamaModel:
    template -> tokenize -> encode -> crop template tokens."""

    PROMPT_TEMPLATE = (
        "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
        "detailing the following aspects: 1. The main content and theme of "
        "the video.2. The color, shape, size, texture, quantity, text, and "
        "spatial relationships of the objects.3. Actions, events, behaviors "
        "temporal relationships, physical movement changes of the objects.4. "
        "background environment, light, style and atmosphere.5. camera "
        "angles, movements, and transitions used in the video:<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")

    def __init__(self, text_len: int, arch: LlamaArch = LLAVA_LLAMA3_8B,
                 params: Optional[Params] = None, tokenizer=None):
        self.text_len = text_len
        self.arch = arch
        self.params = params
        self.tokenizer = tokenizer  # injectable (synthetic in tests)
        self._encode = jax.jit(partial(llama_encode_cropped, arch=arch))

    def infer(self, texts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        texts = [self.PROMPT_TEMPLATE.format(t) for t in texts]
        ids, mask = self.tokenizer(texts, return_mask=True)
        return self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
