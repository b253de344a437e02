"""Wan2.1 weight loading: safetensors -> stacked JAX pytree.

Checkpoint key layout is the reference's (lightx2v/models/networks/wan/
weights/{pre,post,transformer}_weights.py): ``patch_embedding.*``,
``text_embedding.{0,2}.*``, ``time_embedding.{0,2}.*``,
``time_projection.1.*``, ``img_emb.proj.{0,1,3,4}.*`` (i2v),
``blocks.{i}.{modulation, norm3, self_attn.{q,k,v,o,norm_q,norm_k},
cross_attn.{q,k,v,o,norm_q,norm_k[,k_img,v_img,norm_k_img]},
ffn.{0,2}}``, ``head.{head, modulation}``.

TPU-first layout decisions:
* torch Linear stores (out, in); we transpose to (in, out) once at load so
  every GEMM is a plain row-major ``x @ w``;
* all 'blocks.*' leaves are stacked along a leading layer axis so the
  transformer is a single ``lax.scan`` over layers (weights stream
  HBM->VMEM per layer under one fused loop instead of 30-40 dispatches);
* the 1x2x2-stride patch-embedding conv is stored as a flattened
  (in_dim*pt*ph*pw, dim) matrix: a stride==kernel conv is an exact
  reshape+matmul, which maps straight onto the MXU;
* norm scales / modulation tables stay fp32 (they are applied inside fp32
  norm kernels), matmul weights are bf16 (or int8/fp8 + scales when
  quantized).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ...utils.safetensors_io import load_sharded
from .config import WanArch

Params = Dict[str, Any]

_SENSITIVE = ("norm", "modulation", "embedding", "time", "img_emb.proj.0", "img_emb.proj.4")


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _linear(wd: Dict[str, np.ndarray], prefix: str, compute_dtype=ml_dtypes.bfloat16) -> Params:
    """torch Linear -> {"w": (out, in), "b": (out,)} with optional quant
    scale. The (out, in) checkpoint layout is kept (ops/linear.py does an
    NT gemm) so loading is a straight cast/memcpy."""
    w = _np(wd[f"{prefix}.weight"])
    out: Params = {}
    scale_key = f"{prefix}.weight_scale"
    if w.dtype == np.uint8 and scale_key in wd:
        # int4-packed weights keep their 2D per-(channel, group) scales
        out["w"] = w
        out["w_scale"] = _np(wd[scale_key]).astype(np.float32)
    elif w.dtype in (np.int8, ml_dtypes.float8_e4m3fn) or scale_key in wd:
        out["w"] = w
        ws = _np(wd[scale_key]).astype(np.float32)
        # per-channel scales flatten to (out,); block-128 fp8 keeps its
        # (out/128, in/128) grid (ops/linear._mm_fp8_block128 dispatches
        # on ndim)
        out["w_scale"] = ws.reshape(-1) if ws.size == w.shape[0] else ws
    else:
        out["w"] = w if w.dtype == np.dtype(compute_dtype) else w.astype(compute_dtype)
    bkey = f"{prefix}.bias"
    out["b"] = _np(wd[bkey]).astype(np.float32) if bkey in wd else None
    return out


def permute_qk_half(params: Params, arch) -> Params:
    """Permute self-attention q/k output features (and QK-norm scales) from
    interleaved rope pairs (2i, 2i+1) to half-split pairs (i, i + hd/2)
    within each head. Attention output is unchanged (q and k share the
    permutation), but rotation becomes lane-contiguous so the flash kernel
    can apply RoPE in-kernel (ops/pallas/flash_attention.py
    flash_attention_fused_rope; pair with ops/rope.apply_rope_half on
    non-Pallas paths)."""
    hd = arch.head_dim
    half = np.arange(hd).reshape(hd // 2, 2).T.reshape(-1)  # [0,2,..,1,3,..]
    perm = np.concatenate([half + h * hd for h in range(arch.num_heads)])

    blocks = dict(params["blocks"])
    sa = dict(blocks["self_attn"])
    for name in ("q", "k"):
        lin = dict(sa[name])
        assert not isinstance(lin["w"], dict) or "w_scale" not in lin or lin["w"].ndim == 3, \
            "permute_qk_half runs on unquantized or per-channel-quantized weights"
        # plain advanced indexing works on numpy AND jax arrays — device
        # trees (synthetic benches) must not round-trip through the host
        lin["w"] = jnp.asarray(lin["w"][:, perm, :])  # (L, out, in)
        if lin.get("b") is not None:
            lin["b"] = jnp.asarray(lin["b"][:, perm])
        if "w_scale" in lin:
            lin["w_scale"] = jnp.asarray(lin["w_scale"][:, perm])
        sa[name] = lin
    sa["norm_q"] = jnp.asarray(sa["norm_q"][:, perm])
    sa["norm_k"] = jnp.asarray(sa["norm_k"][:, perm])
    blocks["self_attn"] = sa
    out = dict(params)
    out["blocks"] = blocks
    return out


def _maybe(wd, key, dtype=np.float32) -> Optional[np.ndarray]:
    return _np(wd[key]).astype(dtype) if key in wd else None


def build_non_block_params(wd: Dict[str, np.ndarray], arch: WanArch, compute_dtype=ml_dtypes.bfloat16) -> Params:
    """Pre/post (non-``blocks.*``) parameter pytree with numpy leaves —
    shared by the full loader and the lazy disk-streaming store."""

    def _lin(prefix, dt=compute_dtype):
        return _linear(wd, prefix, dt)

    pe_w = _np(wd["patch_embedding.weight"])  # (dim, in_dim, pt, ph, pw)
    d, cin, pt, ph, pw = pe_w.shape
    patch_mat = pe_w.reshape(d, cin * pt * ph * pw).astype(compute_dtype)  # (out, in)

    params: Params = {
        "patch_embedding": {"w": patch_mat, "b": _np(wd["patch_embedding.bias"]).astype(np.float32)},
        "text_embedding": {
            "0": _lin("text_embedding.0"),
            "2": _lin("text_embedding.2"),
        },
        "time_embedding": {
            "0": _lin("time_embedding.0", np.float32),
            "2": _lin("time_embedding.2", np.float32),
        },
        "time_projection": {"1": _lin("time_projection.1", np.float32)},
        "head": {
            **_lin("head.head"),
            "modulation": _np(wd["head.modulation"]).astype(np.float32).reshape(2, arch.dim),
        },
    }

    if "img_emb.proj.1.weight" in wd:
        params["img_emb"] = {
            "norm0": {"w": _maybe(wd, "img_emb.proj.0.weight"), "b": _maybe(wd, "img_emb.proj.0.bias")},
            "1": _lin("img_emb.proj.1"),
            "3": _lin("img_emb.proj.3"),
            "norm4": {"w": _maybe(wd, "img_emb.proj.4.weight"), "b": _maybe(wd, "img_emb.proj.4.bias")},
        }
    if "cfg_cond_proj.weight" in wd:
        params["cfg_cond_proj"] = _lin("cfg_cond_proj", np.float32)
    return params


def build_block_params(wd: Dict[str, np.ndarray], i: int, arch: WanArch,
                       compute_dtype=ml_dtypes.bfloat16) -> Params:
    """One transformer block's parameter pytree (numpy leaves) from the
    flat checkpoint dict — usable on a whole-model dict or on a single
    ``block_{i}.safetensors`` shard (converter 'blocks' layout)."""

    def _lin(prefix, dt=compute_dtype):
        return _linear(wd, prefix, dt)

    p = f"blocks.{i}"
    b: Params = {
        "modulation": _np(wd[f"{p}.modulation"]).astype(np.float32).reshape(6, arch.dim),
        "norm3": {"w": _maybe(wd, f"{p}.norm3.weight"), "b": _maybe(wd, f"{p}.norm3.bias")},
        "self_attn": {
            "q": _lin(f"{p}.self_attn.q"),
            "k": _lin(f"{p}.self_attn.k"),
            "v": _lin(f"{p}.self_attn.v"),
            "o": _lin(f"{p}.self_attn.o"),
            "norm_q": _np(wd[f"{p}.self_attn.norm_q.weight"]).astype(np.float32),
            "norm_k": _np(wd[f"{p}.self_attn.norm_k.weight"]).astype(np.float32),
        },
        "cross_attn": {
            "q": _lin(f"{p}.cross_attn.q"),
            "k": _lin(f"{p}.cross_attn.k"),
            "v": _lin(f"{p}.cross_attn.v"),
            "o": _lin(f"{p}.cross_attn.o"),
            "norm_q": _np(wd[f"{p}.cross_attn.norm_q.weight"]).astype(np.float32),
            "norm_k": _np(wd[f"{p}.cross_attn.norm_k.weight"]).astype(np.float32),
        },
        "ffn": {"0": _lin(f"{p}.ffn.0"), "2": _lin(f"{p}.ffn.2")},
    }
    if f"{p}.cross_attn.k_img.weight" in wd:
        b["cross_attn"]["k_img"] = _lin(f"{p}.cross_attn.k_img")
        b["cross_attn"]["v_img"] = _lin(f"{p}.cross_attn.v_img")
        b["cross_attn"]["norm_k_img"] = _np(wd[f"{p}.cross_attn.norm_k_img.weight"]).astype(np.float32)
    # smooth-quant affine params for advanced_ptq checkpoints
    if f"{p}.affine_norm1.weight" in wd:
        b["smooth_norm1"] = {
            "w": _np(wd[f"{p}.affine_norm1.weight"]).astype(np.float32),
            "b": _np(wd[f"{p}.affine_norm1.bias"]).astype(np.float32),
        }
    if f"{p}.affine_norm3.weight" in wd:
        b["smooth_norm2"] = {
            "w": _np(wd[f"{p}.affine_norm3.weight"]).astype(np.float32),
            "b": _np(wd[f"{p}.affine_norm3.bias"]).astype(np.float32),
        }
    return b


def load_wan_params(weight_dict: Dict[str, np.ndarray], arch: WanArch, compute_dtype=ml_dtypes.bfloat16) -> Params:
    """Build the full parameter pytree from a flat name->array dict.

    ``compute_dtype`` is the matmul weight dtype (bf16 in production;
    fp32 for exact-parity tests). Per-block leaves are stacked along a
    leading layer axis for the ``lax.scan`` transformer."""
    params = build_non_block_params(weight_dict, arch, compute_dtype)
    blocks = [build_block_params(weight_dict, i, arch, compute_dtype) for i in range(arch.num_layers)]
    import jax

    params["blocks"] = jax.tree_util.tree_map(
        lambda *leaves: np.stack(leaves) if leaves[0] is not None else None,
        *blocks,
        is_leaf=lambda x: x is None,
    )
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x), params, is_leaf=lambda x: x is None
    )


def load_wan_from_path(model_path: str, arch: WanArch) -> Params:
    return load_wan_params(load_sharded(model_path), arch)


def init_random_weight_dict(arch: WanArch, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    """Synthesize a random checkpoint with the reference's exact key layout
    (for tests/benchmarks without real weights)."""
    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16
    d, f_, td = arch.dim, arch.ffn_dim, arch.text_dim
    wd: Dict[str, np.ndarray] = {}

    # a small random pool tiled into shape — O(bytes) instead of O(RNG),
    # so synthesizing 14B-scale test checkpoints stays in seconds
    pool = (rng.standard_normal(65537, dtype=np.float32) * scale).astype(bf16)
    _off = [0]

    def randn(*shape):
        # distinct rolling offset per tensor so no two weights are equal
        _off[0] = (_off[0] + 10007) % len(pool)
        return np.resize(np.roll(pool, -_off[0]), shape)

    def lin(prefix, i, o):
        wd[f"{prefix}.weight"] = randn(o, i)
        wd[f"{prefix}.bias"] = randn(o)

    wd["patch_embedding.weight"] = randn(d, arch.in_dim, *arch.patch_size)
    wd["patch_embedding.bias"] = randn(d)
    lin("text_embedding.0", td, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", arch.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    if arch.task == "i2v":
        wd["img_emb.proj.0.weight"] = np.ones(arch.clip_dim, np.float32)
        wd["img_emb.proj.0.bias"] = np.zeros(arch.clip_dim, np.float32)
        lin("img_emb.proj.1", arch.clip_dim, d)
        lin("img_emb.proj.3", d, d)
        wd["img_emb.proj.4.weight"] = np.ones(d, np.float32)
        wd["img_emb.proj.4.bias"] = np.zeros(d, np.float32)
    for i in range(arch.num_layers):
        p = f"blocks.{i}"
        wd[f"{p}.modulation"] = (rng.standard_normal((1, 6, d)) * scale).astype(np.float32)
        wd[f"{p}.norm3.weight"] = np.ones(d, np.float32)
        wd[f"{p}.norm3.bias"] = np.zeros(d, np.float32)
        for m in ("q", "k", "v", "o"):
            lin(f"{p}.self_attn.{m}", d, d)
            lin(f"{p}.cross_attn.{m}", d, d)
        wd[f"{p}.self_attn.norm_q.weight"] = np.ones(d, np.float32)
        wd[f"{p}.self_attn.norm_k.weight"] = np.ones(d, np.float32)
        wd[f"{p}.cross_attn.norm_q.weight"] = np.ones(d, np.float32)
        wd[f"{p}.cross_attn.norm_k.weight"] = np.ones(d, np.float32)
        if arch.task == "i2v":
            lin(f"{p}.cross_attn.k_img", d, d)
            lin(f"{p}.cross_attn.v_img", d, d)
            wd[f"{p}.cross_attn.norm_k_img.weight"] = np.ones(d, np.float32)
        lin(f"{p}.ffn.0", d, f_)
        lin(f"{p}.ffn.2", f_, d)
    lin("head.head", d, arch.out_dim * int(np.prod(arch.patch_size)))
    wd["head.modulation"] = (rng.standard_normal((1, 2, d)) * scale).astype(np.float32)
    return wd


def init_random_params_on_device(arch: WanArch, scheme: str = "bf16", seed: int = 0,
                                 scale: float = 0.02) -> Params:
    """Synthesize the full stacked params pytree DIRECTLY on the accelerator.

    Benchmarks at 14B scale cannot ship weights from the host (a tunneled
    dev chip moves host->device at single-digit MB/s, and 28 GB of bf16
    would not fit host->HBM round trips anyway): one jitted program
    generates every leaf with the device PRNG instead. Layouts match
    ``load_wan_params`` + ``tools/convert.quantize_model`` exactly:

    * scheme "bf16": matmul weights bf16.
    * "int8"/"fp8": blocks' attn/ffn linears carry int8/f8e4m3 ``w`` +
      per-channel ``w_scale`` (ops/linear w8a8 paths).
    * "int4": nibble-packed uint8 ``w`` (out, in//2) + per-(channel, group)
      scales (ops/pallas/int4_matmul.py).
    * "fp8_block128": f8 ``w`` + (out/128, in/128) block scales.

    Non-block (pre/post) weights always stay bf16/fp32, mirroring the
    converter's _SKIP_QUANT rule.
    """
    import itertools

    import jax
    import jax.random as jr

    L, d, f_, td = arch.num_layers, arch.dim, arch.ffn_dim, arch.text_dim
    cnt = itertools.count()

    def build(base):
        def nrm(shape, dtype=jnp.bfloat16, std=scale):
            return jr.normal(jr.fold_in(base, next(cnt)), shape, dtype) * jnp.asarray(std, dtype)

        def qlin(out, kin, stacked=True):
            """One (stacked) quantized/bf16 linear leaf dict."""
            sh = (L, out, kin) if stacked else (out, kin)
            bsh = (L, out) if stacked else (out,)
            key = jr.fold_in(base, next(cnt))
            lin: Params = {"b": jr.normal(jr.fold_in(base, next(cnt)), bsh, jnp.float32) * scale}
            if scheme == "int8":
                lin["w"] = jr.randint(key, sh, -127, 128, jnp.int8)
                lin["w_scale"] = jnp.full(bsh, scale / 127.0, jnp.float32)
            elif scheme == "fp8":
                lin["w"] = (jr.normal(key, sh, jnp.bfloat16) * 100.0).astype(jnp.float8_e4m3fn)
                lin["w_scale"] = jnp.full(bsh, scale / 100.0, jnp.float32)
            elif scheme == "int4":
                from ...ops.pallas.int4_matmul import _pick_bk

                bk = _pick_bk(kin)
                lin["w"] = jr.randint(key, sh[:-1] + (kin // 2,), 0, 256, jnp.uint8)
                lin["w_scale"] = jnp.full(bsh + (kin // bk,), scale / 7.0, jnp.float32)
            elif scheme == "fp8_block128":
                lin["w"] = (jr.normal(key, sh, jnp.bfloat16) * 100.0).astype(jnp.float8_e4m3fn)
                lin["w_scale"] = jnp.full(bsh[:-1] + (-(-out // 128), -(-kin // 128)), scale / 100.0, jnp.float32)
            else:
                lin["w"] = jr.normal(key, sh, jnp.bfloat16) * scale
            return lin

        def bf16lin(out, kin, dt=jnp.bfloat16):
            return {"w": nrm((out, kin), dt), "b": nrm((out,), jnp.float32)}

        pin = arch.in_dim * int(np.prod(arch.patch_size))
        params: Params = {
            "patch_embedding": {"w": nrm((d, pin)), "b": nrm((d,), jnp.float32)},
            "text_embedding": {"0": bf16lin(d, td), "2": bf16lin(d, d)},
            "time_embedding": {"0": bf16lin(d, arch.freq_dim, jnp.float32), "2": bf16lin(d, d, jnp.float32)},
            "time_projection": {"1": bf16lin(6 * d, d, jnp.float32)},
            "head": {**bf16lin(arch.out_dim * int(np.prod(arch.patch_size)), d),
                     "modulation": nrm((2, d), jnp.float32)},
        }
        if arch.task == "i2v":
            params["img_emb"] = {
                "norm0": {"w": jnp.ones(arch.clip_dim, jnp.float32), "b": jnp.zeros(arch.clip_dim, jnp.float32)},
                "1": bf16lin(d, arch.clip_dim),
                "3": bf16lin(d, d),
                "norm4": {"w": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)},
            }
        blocks: Params = {
            "modulation": nrm((L, 6, d), jnp.float32),
            "norm3": {"w": jnp.ones((L, d), jnp.float32), "b": jnp.zeros((L, d), jnp.float32)},
            "self_attn": {
                **{m: qlin(d, d) for m in ("q", "k", "v", "o")},
                "norm_q": jnp.ones((L, d), jnp.float32),
                "norm_k": jnp.ones((L, d), jnp.float32),
            },
            "cross_attn": {
                **{m: qlin(d, d) for m in ("q", "k", "v", "o")},
                "norm_q": jnp.ones((L, d), jnp.float32),
                "norm_k": jnp.ones((L, d), jnp.float32),
            },
            "ffn": {"0": qlin(f_, d), "2": qlin(d, f_)},
        }
        if arch.task == "i2v":
            blocks["cross_attn"]["k_img"] = qlin(d, d)
            blocks["cross_attn"]["v_img"] = qlin(d, d)
            blocks["cross_attn"]["norm_k_img"] = jnp.ones((L, d), jnp.float32)
        params["blocks"] = blocks
        return params

    return jax.jit(build)(jr.PRNGKey(seed))


def quantize_params_on_device(params: Params, scheme: str) -> Params:
    """Quantize a bf16 params tree to ``scheme`` ON DEVICE, preserving the
    loader layouts (same as ``tools/convert.quantize_model`` per-channel /
    per-group math, reference tools/convert/converter.py:294-341). Unlike
    ``init_random_params_on_device(scheme=...)`` — whose quantized leaves
    are independent random draws — this derives every scheme from the SAME
    master weights, which is what a quality/fidelity comparison between
    schemes requires. Only the stacked block linears (w.ndim == 3,
    bf16) are quantized; pre/post weights keep the converter's
    _SKIP_QUANT rule."""
    import jax

    from ...ops.pallas.int4_matmul import _pick_bk

    def quant_lin(lin: Params) -> Params:
        w = lin["w"].astype(jnp.float32)  # (L, out, in)
        out: Params = {"b": lin["b"]}
        if scheme == "int8":
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
            out["w"] = jnp.clip(jnp.round(w / s[..., None]), -127, 127).astype(jnp.int8)
            out["w_scale"] = s
        elif scheme == "fp8":
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 448.0
            out["w"] = (w / s[..., None]).astype(jnp.float8_e4m3fn)
            out["w_scale"] = s
        elif scheme == "int4":
            L_, o, kin = w.shape
            bk = _pick_bk(kin)
            wb = w.reshape(L_, o, kin // bk, bk)
            s = jnp.maximum(jnp.max(jnp.abs(wb), axis=-1), 1e-8) / 7.0
            q = jnp.clip(jnp.round(wb / s[..., None]), -7, 7).astype(jnp.int32)
            lo = (q[..., : bk // 2] + 8).astype(jnp.uint8)
            hi = (q[..., bk // 2 :] + 8).astype(jnp.uint8)
            out["w"] = (lo | (hi << 4)).reshape(L_, o, kin // 2)
            out["w_scale"] = s
        else:
            raise ValueError(f"unknown quant scheme {scheme!r}")
        return out

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 3 \
                    and node["w"].dtype == jnp.bfloat16:
                return quant_lin(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    if scheme in ("bf16", "Default"):
        return params
    out = dict(params)
    out["blocks"] = jax.jit(walk)(params["blocks"])
    return out


def init_structured_quantized_params_on_device(
        arch: WanArch, scheme: str, seed: int = 0, struct_seed: int = 1,
        chunk_layers: int = 4) -> Params:
    """Structured synthetic weights at 14B scale on one 16 GB chip.

    ``structure_params_on_device`` needs a bf16 master, but the 14B
    master is 28 GB — it can never be HBM-resident. Blocks are therefore
    generated -> structured -> quantized in ``chunk_layers``-layer chunks
    (one chunk's bf16 master is ~2 GB) and concatenated leaf-wise along
    the layer axis, dropping chunk references as each leaf lands so the
    peak is ~quantized-size + one leaf's concat (~8.5 GB for 14B int4).

    Schemes are ``quantize_params_on_device``'s ("int8"/"fp8"/"int4" —
    int4 is the w4a8 weight layout). Chunk randomness folds the chunk
    index so layers are independent draws, like the unchunked path."""
    import dataclasses as _dc

    import jax

    L = arch.num_layers
    nc = -(-L // chunk_layers)
    chunk_blocks = []
    non_block: Params = {}
    for c in range(nc):
        lc = min(chunk_layers, L - c * chunk_layers)
        sub = _dc.replace(arch, num_layers=lc)
        p = init_random_params_on_device(sub, scheme="bf16", seed=seed * 1000 + c)
        p = structure_params_on_device(p, seed=struct_seed * 1000 + c)
        p = quantize_params_on_device(p, scheme)
        if c == 0:
            non_block = {k: v for k, v in p.items() if k != "blocks"}
        chunk_blocks.append(p["blocks"])
        del p

    flat0, treedef = jax.tree_util.tree_flatten(chunk_blocks[0])
    chunk_leaves = [jax.tree_util.tree_flatten(cb)[0] for cb in chunk_blocks]
    del chunk_blocks, flat0

    @jax.jit
    def cat(*xs):
        return jnp.concatenate(xs, axis=0)

    out_leaves = []
    for li in range(len(chunk_leaves[0])):
        parts = [cl[li] for cl in chunk_leaves]
        out_leaves.append(cat(*parts))
        for cl in chunk_leaves:  # drop chunk refs so buffers free leaf-by-leaf
            cl[li] = None
    blocks = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return dict(non_block, blocks=blocks)


def structure_params_on_device(params: Params, seed: int = 1,
                               outlier_sigma: float = 0.8, rank: int = 8,
                               spike: float = 3.0) -> Params:
    """Impose trained-checkpoint-like STRUCTURE on a synthetic bf16 tree.

    Pure gaussian weights give isotropic attention: q·k logits are i.i.d.,
    block importance is flat, and sparge tuning degenerates (every layer
    picks the same l1 — BENCHLOG_r04 'flat block importance'). Trained
    DiTs instead show (a) per-channel outliers (the reason smooth-quant
    exists) and (b) low-rank attention structure (sink tokens / dominant
    directions). This transform reproduces both ON DEVICE:

    * every block linear's output channels get lognormal scales
      (exp(sigma * g), heavy right tail), and
    * self-attention q and k projections share ``rank`` right-singular
      spike directions (q gets U_q S V^T, k gets U_k S V^T with a SHARED
      V), which makes the logit matrix q W_q^T W_k k^T carry a dominant
      rank-``rank`` component -> structured, non-flat block importance.

    The result stays a valid bf16 master for quantize_params_on_device
    and the sparge tuner (tools/tune_sparge.py --structured).
    """
    import jax
    import jax.random as jr

    base = jax.random.PRNGKey(seed)

    def lognormal_scale(key, w):
        # (L, out) channel scales, broadcast over in-features
        g = jr.normal(key, w.shape[:-1], jnp.float32)
        return (w.astype(jnp.float32) * jnp.exp(outlier_sigma * g)[..., None]).astype(w.dtype)

    @jax.jit
    def build(p):
        blocks = dict(p["blocks"])
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jr.fold_in(base, cnt[0])

        for mod_name in ("self_attn", "cross_attn", "ffn"):
            mod = dict(blocks[mod_name])
            for k, v in mod.items():
                if isinstance(v, dict) and "w" in v and v["w"].ndim == 3:
                    mod[k] = dict(v, w=lognormal_scale(nk(), v["w"]))
            blocks[mod_name] = mod

        sa = dict(blocks["self_attn"])
        qw, kw = sa["q"]["w"], sa["k"]["w"]  # (L, d, d)
        L_, d_out, d_in = qw.shape
        wstd = jnp.std(qw.astype(jnp.float32))
        v_shared = jr.normal(nk(), (L_, rank, d_in), jnp.float32) / np.sqrt(d_in)
        s_decay = jnp.exp2(-jnp.arange(rank, dtype=jnp.float32))  # 1, .5, .25...
        uq = jr.normal(nk(), (L_, d_out, rank), jnp.float32) / np.sqrt(d_out)
        uk = jr.normal(nk(), (L_, d_out, rank), jnp.float32) / np.sqrt(d_out)
        amp = spike * wstd * jnp.sqrt(jnp.asarray(d_in, jnp.float32))
        q_spike = jnp.einsum("lor,r,lri->loi", uq, s_decay, v_shared) * amp
        k_spike = jnp.einsum("lor,r,lri->loi", uk, s_decay, v_shared) * amp
        sa["q"] = dict(sa["q"], w=(qw.astype(jnp.float32) + q_spike).astype(qw.dtype))
        sa["k"] = dict(sa["k"], w=(kw.astype(jnp.float32) + k_spike).astype(kw.dtype))
        blocks["self_attn"] = sa
        return dict(p, blocks=blocks)

    return build(params)
