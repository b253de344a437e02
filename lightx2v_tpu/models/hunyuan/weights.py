"""HunyuanVideo weight loading (torch .pt state dict -> stacked pytree).

Key layout from the reference (lightx2v/models/networks/hunyuan/weights/
{pre,transformer,post}_weights.py): ``img_in.proj``, ``txt_in.*`` (input
embedder, t/c embedders, 2 token-refiner blocks), ``time_in.mlp.{0,2}``,
``vector_in.{in,out}_layer``, ``guidance_in.mlp.{0,2}``,
``double_blocks.{i}.{img,txt}_{mod.linear, attn_qkv, attn_q_norm,
attn_k_norm, attn_proj, mlp.fc1, mlp.fc2}``, ``single_blocks.{i}.{linear1,
linear2, q_norm, k_norm, modulation.linear}``, ``final_layer.{linear,
adaLN_modulation.1}``. The reference loads .pt (hunyuan/model.py:55-61).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from .config import HunyuanArch

Params = Dict[str, Any]


def _lin(sd, key, dtype=ml_dtypes.bfloat16) -> Params:
    w = np.asarray(sd[f"{key}.weight"])
    p = {"w": w if w.dtype == np.dtype(dtype) else w.astype(dtype)}
    bk = f"{key}.bias"
    p["b"] = np.asarray(sd[bk]).astype(np.float32) if bk in sd else None
    return p


def _norm(sd, key) -> Params:
    p = {"w": np.asarray(sd[f"{key}.weight"], np.float32)}
    bk = f"{key}.bias"
    p["b"] = np.asarray(sd[bk]).astype(np.float32) if bk in sd else None
    return p


def load_hunyuan_params(sd: Dict[str, np.ndarray], arch: HunyuanArch, dtype=ml_dtypes.bfloat16) -> Params:
    pe = np.asarray(sd["img_in.proj.weight"])  # (D, C, pt, ph, pw)
    img_in = {"w": pe.reshape(pe.shape[0], -1).astype(dtype),
              "b": np.asarray(sd["img_in.proj.bias"], np.float32)}

    def refiner(i):
        p = f"txt_in.individual_token_refiner.blocks.{i}"
        return {
            "norm1": _norm(sd, f"{p}.norm1"),
            "qkv": _lin(sd, f"{p}.self_attn_qkv", dtype),
            "proj": _lin(sd, f"{p}.self_attn_proj", dtype),
            "norm2": _norm(sd, f"{p}.norm2"),
            "mlp_fc1": _lin(sd, f"{p}.mlp.fc1", dtype),
            "mlp_fc2": _lin(sd, f"{p}.mlp.fc2", dtype),
            "adaLN": _lin(sd, f"{p}.adaLN_modulation.1", dtype),
        }

    def dblock(i):
        p = f"double_blocks.{i}"
        return {
            "img_mod": _lin(sd, f"{p}.img_mod.linear", dtype),
            "img_attn_qkv": _lin(sd, f"{p}.img_attn_qkv", dtype),
            "img_attn_q_norm": np.asarray(sd[f"{p}.img_attn_q_norm.weight"], np.float32),
            "img_attn_k_norm": np.asarray(sd[f"{p}.img_attn_k_norm.weight"], np.float32),
            "img_attn_proj": _lin(sd, f"{p}.img_attn_proj", dtype),
            "img_mlp_fc1": _lin(sd, f"{p}.img_mlp.fc1", dtype),
            "img_mlp_fc2": _lin(sd, f"{p}.img_mlp.fc2", dtype),
            "txt_mod": _lin(sd, f"{p}.txt_mod.linear", dtype),
            "txt_attn_qkv": _lin(sd, f"{p}.txt_attn_qkv", dtype),
            "txt_attn_q_norm": np.asarray(sd[f"{p}.txt_attn_q_norm.weight"], np.float32),
            "txt_attn_k_norm": np.asarray(sd[f"{p}.txt_attn_k_norm.weight"], np.float32),
            "txt_attn_proj": _lin(sd, f"{p}.txt_attn_proj", dtype),
            "txt_mlp_fc1": _lin(sd, f"{p}.txt_mlp.fc1", dtype),
            "txt_mlp_fc2": _lin(sd, f"{p}.txt_mlp.fc2", dtype),
        }

    def sblock(i):
        p = f"single_blocks.{i}"
        return {
            "linear1": _lin(sd, f"{p}.linear1", dtype),
            "linear2": _lin(sd, f"{p}.linear2", dtype),
            "q_norm": np.asarray(sd[f"{p}.q_norm.weight"], np.float32),
            "k_norm": np.asarray(sd[f"{p}.k_norm.weight"], np.float32),
            "modulation": _lin(sd, f"{p}.modulation.linear", dtype),
        }

    stack = lambda blocks: jax.tree_util.tree_map(
        lambda *ls: None if ls[0] is None else np.stack(ls), *blocks,
        is_leaf=lambda x: x is None)

    params: Params = {
        "img_in": img_in,
        "time_in": {"0": _lin(sd, "time_in.mlp.0", dtype), "2": _lin(sd, "time_in.mlp.2", dtype)},
        "vector_in": {"0": _lin(sd, "vector_in.in_layer", dtype), "2": _lin(sd, "vector_in.out_layer", dtype)},
        "txt_in": {
            "input_embedder": _lin(sd, "txt_in.input_embedder", dtype),
            "t_embedder": {"0": _lin(sd, "txt_in.t_embedder.mlp.0", dtype), "2": _lin(sd, "txt_in.t_embedder.mlp.2", dtype)},
            "c_embedder_1": _lin(sd, "txt_in.c_embedder.linear_1", dtype),
            "c_embedder_2": _lin(sd, "txt_in.c_embedder.linear_2", dtype),
            "refiner": [refiner(0), refiner(1)],
        },
        "double_blocks": stack([dblock(i) for i in range(arch.double_blocks)]),
        "single_blocks": stack([sblock(i) for i in range(arch.single_blocks)]),
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear", np.float32),
            "adaLN": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        },
    }
    if "guidance_in.mlp.0.weight" in sd:
        params["guidance_in"] = {"0": _lin(sd, "guidance_in.mlp.0", dtype), "2": _lin(sd, "guidance_in.mlp.2", dtype)}
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x), params, is_leaf=lambda x: x is None)


def load_hunyuan_from_path(path: str, arch: HunyuanArch) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "module" in sd:
        sd = sd["module"]
    sd = {k: (v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()) for k, v in sd.items()}
    return load_hunyuan_params(sd, arch)


def init_random_hunyuan_state_dict(arch: HunyuanArch, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    pool = (rng.standard_normal(65537, dtype=np.float32) * scale).astype(ml_dtypes.bfloat16)
    _off = [0]

    def randn(*shape):
        _off[0] = (_off[0] + 10007) % len(pool)
        return np.resize(np.roll(pool, -_off[0]), shape)

    sd: Dict[str, np.ndarray] = {}

    def lin(key, i, o, bias=True):
        sd[f"{key}.weight"] = randn(o, i)
        if bias:
            sd[f"{key}.bias"] = randn(o)

    def norm(key, d_, affine_bias=True):
        sd[f"{key}.weight"] = np.ones(d_, np.float32)
        if affine_bias:
            sd[f"{key}.bias"] = np.zeros(d_, np.float32)

    d = arch.hidden_size
    sd["img_in.proj.weight"] = randn(d, arch.in_channels, *arch.patch_size)
    sd["img_in.proj.bias"] = randn(d)
    lin("time_in.mlp.0", 256, d)
    lin("time_in.mlp.2", d, d)
    lin("vector_in.in_layer", arch.text_states_dim_2, d)
    lin("vector_in.out_layer", d, d)
    if arch.guidance_embed:
        lin("guidance_in.mlp.0", 256, d)
        lin("guidance_in.mlp.2", d, d)
    lin("txt_in.input_embedder", arch.text_states_dim, d)
    lin("txt_in.t_embedder.mlp.0", 256, d)
    lin("txt_in.t_embedder.mlp.2", d, d)
    lin("txt_in.c_embedder.linear_1", arch.text_states_dim, d)
    lin("txt_in.c_embedder.linear_2", d, d)
    for i in range(2):
        p = f"txt_in.individual_token_refiner.blocks.{i}"
        norm(f"{p}.norm1", d)
        lin(f"{p}.self_attn_qkv", d, 3 * d)
        lin(f"{p}.self_attn_proj", d, d)
        norm(f"{p}.norm2", d)
        lin(f"{p}.mlp.fc1", d, 4 * d)
        lin(f"{p}.mlp.fc2", 4 * d, d)
        lin(f"{p}.adaLN_modulation.1", d, 2 * d)
    for i in range(arch.double_blocks):
        p = f"double_blocks.{i}"
        for s in ("img", "txt"):
            lin(f"{p}.{s}_mod.linear", d, 6 * d)
            lin(f"{p}.{s}_attn_qkv", d, 3 * d)
            sd[f"{p}.{s}_attn_q_norm.weight"] = np.ones(arch.head_dim, np.float32)
            sd[f"{p}.{s}_attn_k_norm.weight"] = np.ones(arch.head_dim, np.float32)
            lin(f"{p}.{s}_attn_proj", d, d)
            lin(f"{p}.{s}_mlp.fc1", d, arch.mlp_hidden_dim)
            lin(f"{p}.{s}_mlp.fc2", arch.mlp_hidden_dim, d)
    for i in range(arch.single_blocks):
        p = f"single_blocks.{i}"
        lin(f"{p}.linear1", d, 3 * d + arch.mlp_hidden_dim)
        lin(f"{p}.linear2", d + arch.mlp_hidden_dim, d)
        sd[f"{p}.q_norm.weight"] = np.ones(arch.head_dim, np.float32)
        sd[f"{p}.k_norm.weight"] = np.ones(arch.head_dim, np.float32)
        lin(f"{p}.modulation.linear", d, 3 * d)
    pt, ph, pw = arch.patch_size
    lin("final_layer.linear", d, arch.out_channels * pt * ph * pw)
    lin("final_layer.adaLN_modulation.1", d, 2 * d)
    return sd


def init_random_hunyuan_params_on_device(arch: HunyuanArch, scheme: str = "bf16",
                                         seed: int = 0, scale: float = 0.02) -> Params:
    """Synthesize the full Hunyuan params pytree DIRECTLY on the accelerator
    (same rationale as wan.weights.init_random_params_on_device: the
    tunneled bench chip moves host->device at single-digit MB/s, and the
    ~13 GB full model could never ship from host). Layouts match
    ``load_hunyuan_params``; scheme "int8"/"fp8" gives every double/single
    block linear (incl. the mod projections — all of them run through
    mm_fn, model.py:195-252) quantized ``w`` + per-channel ``w_scale``
    while the pre/post weights stay bf16/fp32."""
    import itertools

    import jax.random as jr

    d = arch.hidden_size
    mlp = arch.mlp_hidden_dim
    cnt = itertools.count()

    def build(base):
        def nrm(shape, dtype=jnp.bfloat16, std=scale):
            return jr.normal(jr.fold_in(base, next(cnt)), shape, dtype) * jnp.asarray(std, dtype)

        def bf16lin(out, kin, wdt=jnp.bfloat16):
            return {"w": nrm((out, kin), wdt), "b": nrm((out,), jnp.float32)}

        def qlin(out, kin, L):
            sh, bsh = (L, out, kin), (L, out)
            key = jr.fold_in(base, next(cnt))
            lin: Params = {"b": jr.normal(jr.fold_in(base, next(cnt)), bsh, jnp.float32) * scale}
            if scheme == "int8":
                lin["w"] = jr.randint(key, sh, -127, 128, jnp.int8)
                lin["w_scale"] = jnp.full(bsh, scale / 127.0, jnp.float32)
            elif scheme == "fp8":
                lin["w"] = (jr.normal(key, sh, jnp.bfloat16) * 100.0).astype(jnp.float8_e4m3fn)
                lin["w_scale"] = jnp.full(bsh, scale / 100.0, jnp.float32)
            elif scheme == "int4":
                # nibble-packed w4 + per-(channel, group) scales — the w4a8
                # capacity layout (ops/pallas/int4_matmul.py); full Hunyuan
                # int8 is 12.7 GB and leaves no activation room on one v5e
                from ...ops.pallas.int4_matmul import _pick_bk

                bk = _pick_bk(kin)
                lin["w"] = jr.randint(key, sh[:-1] + (kin // 2,), 0, 256, jnp.uint8)
                lin["w_scale"] = jnp.full(bsh + (kin // bk,), scale / 7.0, jnp.float32)
            else:
                lin["w"] = jr.normal(key, sh, jnp.bfloat16) * scale
            return lin

        ones_hd = lambda L: jnp.ones((L, arch.head_dim), jnp.float32)

        def refiner():
            return {
                "norm1": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
                "qkv": bf16lin(3 * d, d),
                "proj": bf16lin(d, d),
                "norm2": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
                "mlp_fc1": bf16lin(4 * d, d),
                "mlp_fc2": bf16lin(d, 4 * d),
                "adaLN": bf16lin(2 * d, d),
            }

        Ld, Ls = arch.double_blocks, arch.single_blocks
        pt, ph, pw = arch.patch_size
        params: Params = {
            "img_in": {"w": nrm((d, arch.in_channels * pt * ph * pw)),
                       "b": nrm((d,), jnp.float32)},
            "time_in": {"0": bf16lin(d, 256), "2": bf16lin(d, d)},
            "vector_in": {"0": bf16lin(d, arch.text_states_dim_2), "2": bf16lin(d, d)},
            "txt_in": {
                "input_embedder": bf16lin(d, arch.text_states_dim),
                "t_embedder": {"0": bf16lin(d, 256), "2": bf16lin(d, d)},
                "c_embedder_1": bf16lin(d, arch.text_states_dim),
                "c_embedder_2": bf16lin(d, d),
                "refiner": [refiner(), refiner()],
            },
            "double_blocks": {
                **{f"{s}_mod": qlin(6 * d, d, Ld) for s in ("img", "txt")},
                **{f"{s}_attn_qkv": qlin(3 * d, d, Ld) for s in ("img", "txt")},
                **{f"{s}_attn_q_norm": ones_hd(Ld) for s in ("img", "txt")},
                **{f"{s}_attn_k_norm": ones_hd(Ld) for s in ("img", "txt")},
                **{f"{s}_attn_proj": qlin(d, d, Ld) for s in ("img", "txt")},
                **{f"{s}_mlp_fc1": qlin(mlp, d, Ld) for s in ("img", "txt")},
                **{f"{s}_mlp_fc2": qlin(d, mlp, Ld) for s in ("img", "txt")},
            },
            "single_blocks": {
                "linear1": qlin(3 * d + mlp, d, Ls),
                "linear2": qlin(d, d + mlp, Ls),
                "q_norm": ones_hd(Ls),
                "k_norm": ones_hd(Ls),
                "modulation": qlin(3 * d, d, Ls),
            },
            "final_layer": {
                "linear": bf16lin(arch.out_channels * pt * ph * pw, d, jnp.float32),
                "adaLN": bf16lin(2 * d, d),
            },
        }
        if arch.guidance_embed:
            params["guidance_in"] = {"0": bf16lin(d, 256), "2": bf16lin(d, d)}
        return params

    return jax.jit(build)(jax.random.PRNGKey(seed))
