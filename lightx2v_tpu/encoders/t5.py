"""UMT5-XXL text encoder in pure JAX.

Behavior matches the reference's from-scratch torch implementation
(lightx2v/models/input_encoders/hf/t5/model.py): pre-norm encoder blocks
with T5 RMS LayerNorm, unscaled attention plus per-layer bidirectional
relative-position bias (UMT5 has shared_pos=False: each layer owns its
(num_buckets, num_heads) embedding), gated-GELU FFN (fc1(x) * gelu(gate(x))),
final norm; the output context rows past each prompt's length are zeroed
(the reference trims to seq_lens and re-pads with zeros in pre_infer,
t5/model.py:601 + wan/infer/pre_infer.py:90).

TPU structure: blocks are stacked and scanned; the relative-position
bucket table is precomputed host-side for the static text_len; everything
jits into one program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    shared_pos: bool = False  # T5 v1.1 shares one relative bias table


UMT5_XXL = T5Config()


def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32, max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket ids, host-side (reference t5/model.py:255-280)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(np.int64) * nb
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    buckets += np.where(is_small, rel, rel_large)
    return buckets  # (lq, lk)


def t5_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (w.astype(jnp.float32) * out).astype(x.dtype)


def _lin(p, x):
    # (out, in) layout, no bias (T5 linears are bias-free). Quantized
    # encoder linears (reference q_linear.py) arrive as {"w": int8/fp8,
    # "w_scale": fp32} dicts and take the w8a8 MXU path.
    if isinstance(p, dict):
        from ..ops.linear import resolve_mm

        scheme = "int8" if p["w"].dtype == jnp.int8 else "fp8"
        fn = resolve_mm(f"W-{scheme}-channel-sym-A-{scheme}-channel-sym-dynamic-Tpu")
        return fn({"w": p["w"], "w_scale": p["w_scale"], "b": None}, x)
    return jax.lax.dot_general(x, p, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32).astype(x.dtype)


def t5_block(block: Params, x: jnp.ndarray, bias_mask: jnp.ndarray, bucket_ids: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    b, L, d = x.shape
    n, hd = cfg.num_heads, cfg.dim_attn // cfg.num_heads

    # self attention
    h = t5_norm(block["norm1"], x)
    q = _lin(block["q"], h).reshape(b, L, n, hd)
    k = _lin(block["k"], h).reshape(b, L, n, hd)
    v = _lin(block["v"], h).reshape(b, L, n, hd)
    # per-layer relative position bias: gather (L, L) buckets from (nb, n)
    pos = block["rel_emb"][bucket_ids]  # (L, L, n)
    bias = pos.transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, n, L, L)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias + bias_mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, L, cfg.dim_attn)
    x = x + _lin(block["o"], attn)

    # gated-GELU FFN
    h = t5_norm(block["norm2"], x)
    gate = jax.nn.gelu(_lin(block["gate"], h).astype(jnp.float32), approximate=True)
    y = _lin(block["fc1"], h).astype(jnp.float32) * gate
    x = x + _lin(block["fc2"], y.astype(x.dtype))
    return x


def t5_encode(params: Params, ids: jnp.ndarray, mask: jnp.ndarray, cfg: T5Config = UMT5_XXL) -> jnp.ndarray:
    """ids, mask: (B, L) -> (B, L, dim) bf16 context with padded rows zeroed."""
    L = ids.shape[1]
    bucket_ids = jnp.asarray(relative_position_buckets(L, L, cfg.num_buckets, cfg.max_dist))
    x = params["token_embedding"][ids].astype(jnp.bfloat16)
    neg = jnp.finfo(jnp.float32).min
    bias_mask = jnp.where(mask[:, None, None, :] > 0, 0.0, neg).astype(jnp.float32)

    def body(carry, block):
        return t5_block(block, carry, bias_mask, bucket_ids, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = t5_norm(params["norm"], x)
    # zero the rows past each prompt's length
    return (x * (mask[..., None] > 0)).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------

def load_t5_params(state_dict: Dict[str, np.ndarray], cfg: T5Config = UMT5_XXL, dtype=None) -> Params:
    """torch state_dict (keys from the reference T5Encoder) -> pytree."""
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16
    sd = state_dict

    def w(key):
        a = np.asarray(sd[key])
        return a if a.dtype == np.dtype(dtype) else a.astype(dtype)

    def block(i):
        p = f"blocks.{i}"
        if cfg.shared_pos:
            rel = np.asarray(sd["pos_embedding.embedding.weight"], np.float32)
        else:
            rel = np.asarray(sd[f"{p}.pos_embedding.embedding.weight"], np.float32)
        return {
            "norm1": np.asarray(sd[f"{p}.norm1.weight"], np.float32),
            "q": w(f"{p}.attn.q.weight"),
            "k": w(f"{p}.attn.k.weight"),
            "v": w(f"{p}.attn.v.weight"),
            "o": w(f"{p}.attn.o.weight"),
            "rel_emb": rel,
            "norm2": np.asarray(sd[f"{p}.norm2.weight"], np.float32),
            "gate": w(f"{p}.ffn.gate.0.weight"),
            "fc1": w(f"{p}.ffn.fc1.weight"),
            "fc2": w(f"{p}.ffn.fc2.weight"),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *ls: np.stack(ls), *blocks)
    params = {
        "token_embedding": w("token_embedding.weight"),
        "blocks": stacked,
        "norm": np.asarray(sd["norm.weight"], np.float32),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_t5_from_path(path: str, cfg: T5Config = UMT5_XXL) -> Params:
    if path.endswith(".safetensors"):
        from ..utils.safetensors_io import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() if v.dtype != torch.bfloat16 else v.float().numpy()
              for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
    return load_t5_params(sd, cfg)


def init_random_t5_state_dict(cfg: T5Config, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    pool = (rng.standard_normal(65537, dtype=np.float32) * scale)
    _off = [0]

    def randn(*shape):
        _off[0] = (_off[0] + 10007) % len(pool)
        return np.resize(np.roll(pool, -_off[0]), shape).astype(np.float32)

    sd["token_embedding.weight"] = randn(cfg.vocab_size, cfg.dim)
    if cfg.shared_pos:
        sd["pos_embedding.embedding.weight"] = randn(cfg.num_buckets, cfg.num_heads)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(cfg.dim, np.float32)
        for m in ("q", "k", "v", "o"):
            sd[f"{p}.attn.{m}.weight"] = randn(cfg.dim_attn, cfg.dim)
        if not cfg.shared_pos:
            sd[f"{p}.pos_embedding.embedding.weight"] = randn(cfg.num_buckets, cfg.num_heads)
        sd[f"{p}.norm2.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"{p}.ffn.gate.0.weight"] = randn(cfg.dim_ffn, cfg.dim)
        sd[f"{p}.ffn.fc1.weight"] = randn(cfg.dim_ffn, cfg.dim)
        sd[f"{p}.ffn.fc2.weight"] = randn(cfg.dim, cfg.dim_ffn)
    sd["norm.weight"] = np.ones(cfg.dim, np.float32)
    return sd


class T5EncoderModel:
    """User-facing wrapper mirroring the reference's T5EncoderModel
    (t5/model.py:515-601): tokenize -> encode -> per-prompt contexts."""

    def __init__(self, text_len: int, checkpoint_path: Optional[str] = None,
                 tokenizer_path: Optional[str] = None, cfg: T5Config = UMT5_XXL,
                 params: Optional[Params] = None):
        self.text_len = text_len
        self.cfg = cfg
        self.params = params if params is not None else load_t5_from_path(checkpoint_path, cfg)
        self.tokenizer_path = tokenizer_path
        self.tokenizer = None  # injectable (synthetic tokenizer in tests)
        self._encode = jax.jit(partial(t5_encode, cfg=cfg))

    def infer(self, texts) -> jnp.ndarray:
        if self.tokenizer is not None:
            ids, mask = self.tokenizer(texts, return_mask=True)
        else:
            assert self.tokenizer_path, "tokenizer_path required for text input"
            from .tokenizer import encode_prompts

            ids, mask = encode_prompts(self.tokenizer_path, texts, self.text_len)
        return self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))


def init_random_t5_params_on_device(cfg: T5Config = UMT5_XXL, scheme: str = "bf16",
                                    seed: int = 0, scale: float = 0.02) -> Params:
    """Synthesize the stacked T5 params pytree DIRECTLY on the accelerator
    (layout identical to ``load_t5_params`` / ``quantize_t5_params``).

    Why: at UMT5-XXL scale the host state dict is ~19 GB f32 and the
    benchmark chip sits behind a tunnel moving host->device at
    single-digit MB/s — like the DiT's
    ``models/wan/weights.init_random_params_on_device``, one jitted
    program generates every leaf with the device PRNG instead. scheme
    "int8"/"fp8" emits {"w", "w_scale"} dicts for the seven block
    linears (the reference's quantized-encoder q_linear.py path,
    t5/model.py:284-349 offload analog)."""
    import itertools

    import jax.random as jr

    L, d, da, df = cfg.num_layers, cfg.dim, cfg.dim_attn, cfg.dim_ffn
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
                # clip to the e4m3 representable range before the cast:
                # values past ~448 convert to NaN, and at XXL scale the
                # normal*100 tail produces ~20k of them (one NaN poisons
                # the whole encoded context). Mirrors taylorseer store().
                vals = jnp.clip(jr.normal(key, sh, jnp.bfloat16) * 100.0, -448.0, 448.0)
                return {"w": vals.astype(jnp.float8_e4m3fn),
                        "w_scale": jnp.full(bsh, scale / 100.0, jnp.float32)}
            return nrm(sh)

        blocks: Params = {
            "norm1": jnp.ones((L, d), jnp.float32),
            "q": qlin(da, d), "k": qlin(da, d), "v": qlin(da, d), "o": qlin(d, da),
            "rel_emb": nrm((L, cfg.num_buckets, cfg.num_heads), jnp.float32),
            "norm2": jnp.ones((L, d), jnp.float32),
            "gate": qlin(df, d), "fc1": qlin(df, d), "fc2": qlin(d, df),
        }
        return {
            "token_embedding": nrm((cfg.vocab_size, d)),
            "blocks": blocks,
            "norm": jnp.ones(d, jnp.float32),
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


def quantize_t5_params(params: Params, scheme: str = "int8") -> Params:
    """Auto-quantize the encoder's matmul weights to int8/fp8 per output
    channel (reference t5_quantized / q_linear.py path)."""
    from ..tools.convert import quantize_tensor
    import numpy as np

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("q", "k", "v", "o", "gate", "fc1", "fc2"):
        w = np.asarray(blocks[name], np.float32)  # (L, out, in)
        qs, scales = [], []
        for i in range(w.shape[0]):
            qi, si = quantize_tensor(w[i], scheme)
            qs.append(qi)
            scales.append(si)
        blocks[name] = {"w": jnp.asarray(np.stack(qs)), "w_scale": jnp.asarray(np.stack(scales))}
    out["blocks"] = blocks
    return out
