"""Checkpoint converter / quantizer (reference: tools/convert/converter.py).

Produces quantized DiT checkpoints consumable by the runtime's int8/fp8
matmul paths: per-output-channel symmetric scales stored as
``<name>.weight_scale`` next to int8/fp8 ``<name>.weight`` tensors
(matching the reference's quantized-ckpt layout, converter.py:294-409).
Supports LoRA folding before quantization and three output layouts:
single file, chunked-with-index, per-block ``block_N.safetensors``
(the lazy-load layout, converter.py:591-612).

Usage:
    python -m lightx2v_tpu.tools.convert --source <ckpt_dir> --output <dir> \
        --quant int8 --layout single [--lora path:strength ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import ml_dtypes
import numpy as np

from ..utils.logging_utils import logger
from ..utils.safetensors_io import load_sharded, save_file

# weights that must stay high precision (norms/modulation/embeddings)
_SKIP_QUANT = re.compile(
    r"(norm|modulation|embedding|time_|head\.|img_emb|patch_embedding|bias$|txt_in|vector_in|guidance_in|final_layer)"
)
_BLOCK_RE = re.compile(r"^(blocks|double_blocks|single_blocks)\.(\d+)\.")


def quantize_tensor(w: np.ndarray, scheme: str) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric quantization (reference converter.py:294-341)."""
    wf = np.asarray(w, np.float32)
    absmax = np.abs(wf).max(axis=1)
    if scheme == "int8":
        scale = np.maximum(absmax, 1e-8) / 127.0
        q = np.clip(np.round(wf / scale[:, None]), -127, 127).astype(np.int8)
    elif scheme == "fp8":
        scale = np.maximum(absmax, 1e-8) / 448.0
        q = (wf / scale[:, None]).astype(ml_dtypes.float8_e4m3fn)
    elif scheme == "int4":
        # weight-only 4-bit, per-(channel, group) scales, nibble-packed
        # (ops/pallas/int4_matmul.py; nvfp4-GEMM analog)
        from ..ops.pallas.int4_matmul import quantize_int4

        return quantize_int4(wf)
    elif scheme == "fp8_block128":
        # 128x128 block scales (reference Deepgemm per_block_cast_to_fp8,
        # mm_weight.py:218-230); consumed by ops/linear._mm_fp8_block128
        o, i = wf.shape
        po, pi = (-o) % 128, (-i) % 128
        wp = np.pad(wf, ((0, po), (0, pi)))
        blocks = wp.reshape((o + po) // 128, 128, (i + pi) // 128, 128)
        amax = np.maximum(np.abs(blocks).max(axis=(1, 3), keepdims=True), 1e-4)
        qp = (blocks * (448.0 / amax)).astype(ml_dtypes.float8_e4m3fn)
        q = qp.reshape(o + po, i + pi)[:o, :i]
        scale = (amax[:, 0, :, 0] / 448.0).astype(np.float32)  # (ob, ib)
        return np.ascontiguousarray(q), scale
    elif scheme in ("mxfp8", "mxfp6"):
        # mx formats: block-32 power-of-two (e8m0-class) shared scales
        # (reference lightx2v_kernel mxfp8_*.cu / mxfp6_*.cu; fp6 packs
        # 4 values into 3 bytes — the "3n/4" layout)
        o, i = wf.shape
        assert i % 32 == 0, f"mx formats need in_features%32==0, got {i}"
        g = wf.reshape(o, i // 32, 32)
        amax = np.maximum(np.abs(g).max(axis=2), 1e-12)  # (o, i/32)
        fmax = 448.0 if scheme == "mxfp8" else 7.5  # e4m3 / e2m3 max finite
        # smallest pow2 scale with amax/scale <= fmax: no saturation loss
        # (floor(log2(amax))-emax leaves the top of each block in the
        # overflow band, which e4m3fn rounds to NaN and clipping would
        # crush by up to 12%)
        scale = np.exp2(np.ceil(np.log2(amax / fmax))).astype(np.float32)
        el = np.clip(g / scale[:, :, None], -fmax, fmax)  # fp rounding guard
        if scheme == "mxfp8":
            q = el.astype(ml_dtypes.float8_e4m3fn).reshape(o, i)
            return np.ascontiguousarray(q), scale
        codes = el.astype(ml_dtypes.float6_e2m3fn).view(np.uint8).reshape(o, i)
        c = codes.reshape(o, i // 4, 4).astype(np.uint32)
        bits = c[..., 0] | (c[..., 1] << 6) | (c[..., 2] << 12) | (c[..., 3] << 18)
        packed = np.stack([bits & 255, (bits >> 8) & 255, (bits >> 16) & 255],
                          axis=-1).astype(np.uint8).reshape(o, 3 * i // 4)
        return np.ascontiguousarray(packed), scale
    else:
        raise ValueError(f"unknown quant scheme {scheme}")
    return q, scale.astype(np.float32)


def apply_lora(weights: Dict[str, np.ndarray], lora: Dict[str, np.ndarray], strength: float = 1.0) -> None:
    """Fold LoRA factors into base weights in place (reference
    lora_adapter.py:39-131: lora_A/B pairs, diff/diff_b additive deltas)."""
    applied = 0
    for key in list(lora.keys()):
        if key.endswith("lora_A.weight") or key.endswith("lora_down.weight"):
            up_key = key.replace("lora_A", "lora_B").replace("lora_down", "lora_up")
            base_key = re.sub(r"\.(lora_A|lora_down)\.weight$", ".weight", key)
            base_key = base_key.replace("diffusion_model.", "")
            if up_key in lora and base_key in weights:
                a = np.asarray(lora[key], np.float32)
                b = np.asarray(lora[up_key], np.float32)
                weights[base_key] = (np.asarray(weights[base_key], np.float32) + strength * (b @ a)).astype(
                    weights[base_key].dtype)
                applied += 1
        elif key.endswith(".diff"):
            base_key = key[: -len(".diff")] + ".weight"
            base_key = base_key.replace("diffusion_model.", "")
            if base_key in weights:
                weights[base_key] = (np.asarray(weights[base_key], np.float32)
                                     + strength * np.asarray(lora[key], np.float32)).astype(weights[base_key].dtype)
                applied += 1
        elif key.endswith(".diff_b"):
            base_key = key[: -len(".diff_b")] + ".bias"
            base_key = base_key.replace("diffusion_model.", "")
            if base_key in weights:
                weights[base_key] = (np.asarray(weights[base_key], np.float32)
                                     + strength * np.asarray(lora[key], np.float32)).astype(weights[base_key].dtype)
                applied += 1
    logger.info(f"applied {applied} LoRA deltas")


def apply_smooth_quant(weights: Dict[str, np.ndarray], stats: Dict[str, np.ndarray],
                       alpha: float = 0.5) -> None:
    """Fold SmoothQuant factors in place (advanced_ptq production).

    Per block, the two smoothable sites (reference consumes the result via
    affine_norm1/affine_norm3, transformer_weights.py:193-209,352-362):
      * self-attn input -> q/k/v columns scaled by s, affine_norm1 = 1/s;
      * FFN input -> ffn.0 columns scaled by s, affine_norm3 = 1/s.
    The runtime applies 1/s on the modulated-LN activation path
    (models/wan/model.py smooth_norm1/smooth_norm2), so quantizing the
    scaled weights is numerically transparent pre-quantization.
    """
    from .calibrate import smooth_factors

    block_ids = sorted({int(k.split(".")[1]) for k in weights if k.startswith("blocks.")})
    n_smoothed = 0
    for i in block_ids:
        for site, mods, affine in (
            ("self_attn.q", ["self_attn.q", "self_attn.k", "self_attn.v"], "affine_norm1"),
            ("ffn.0", ["ffn.0"], "affine_norm3"),
        ):
            act = stats.get(f"blocks.{i}.{site}")
            if act is None:
                continue
            wmax = None
            for m in mods:
                w = np.abs(np.asarray(weights[f"blocks.{i}.{m}.weight"], np.float32)).max(axis=0)
                wmax = w if wmax is None else np.maximum(wmax, w)
            s = smooth_factors(wmax, act, alpha)
            for m in mods:
                key = f"blocks.{i}.{m}.weight"
                weights[key] = (np.asarray(weights[key], np.float32) * s[None, :]).astype(np.float32)
            inv = (1.0 / s).astype(np.float32)
            weights[f"blocks.{i}.{affine}.weight"] = inv
            weights[f"blocks.{i}.{affine}.bias"] = inv.copy()
            n_smoothed += 1
    logger.info(f"smooth-quant folded at {n_smoothed} sites (alpha={alpha})")


def quantize_model(weights: Dict[str, np.ndarray], scheme: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    n_q = 0
    for name, w in weights.items():
        if w.ndim == 2 and not _SKIP_QUANT.search(name):
            q, scale = quantize_tensor(w, scheme)
            out[name] = q
            out[name.replace(".weight", ".weight_scale") if name.endswith(".weight") else name + "_scale"] = scale
            n_q += 1
        else:
            out[name] = w
    logger.info(f"quantized {n_q} matmul weights to {scheme}")
    return out


def save_quantized(weights: Dict[str, np.ndarray], out_dir: str, layout: str = "single",
                   scheme: Optional[str] = None, chunk_gb: float = 4.0,
                   advanced_ptq: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    if layout == "single":
        save_file(weights, os.path.join(out_dir, "model.safetensors"))
    elif layout == "chunked":
        index = {"weight_map": {}, "metadata": {}}
        chunk, size, idx = {}, 0, 0
        limit = chunk_gb * 2**30

        def flush():
            nonlocal chunk, size, idx
            if chunk:
                fname = f"model-{idx:05d}.safetensors"
                save_file(chunk, os.path.join(out_dir, fname))
                for k in chunk:
                    index["weight_map"][k] = fname
                chunk, size = {}, 0
                idx += 1

        for k, v in weights.items():
            chunk[k] = v
            size += v.nbytes
            if size >= limit:
                flush()
        flush()
        with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=2)
    elif layout == "blocks":
        # per-block files for lazy / streamed loading (reference lazy layout)
        blocks: Dict[str, Dict[str, np.ndarray]] = {}
        non_block: Dict[str, np.ndarray] = {}
        for k, v in weights.items():
            m = _BLOCK_RE.match(k)
            if m:
                blocks.setdefault(f"{m.group(1)}_{m.group(2)}", {})[k] = v
            else:
                non_block[k] = v
        for bname, tensors in blocks.items():
            save_file(tensors, os.path.join(out_dir, f"block_{bname.split('_')[-1]}.safetensors"))
        save_file(non_block, os.path.join(out_dir, "non_block.safetensors"))
    else:
        raise ValueError(f"unknown layout {layout}")

    cfg: Dict[str, Any] = {"mm_type": mm_type_for_scheme(scheme)}
    if advanced_ptq:
        cfg["quant_method"] = "advanced_ptq"
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def mm_type_for_scheme(scheme: Optional[str]) -> str:
    """Runtime mm_type string for each quant scheme — weight-only schemes
    (int4) keep bf16 activations, so their mm_type must not claim dynamic
    activation quant."""
    if not scheme:
        return "Default"
    if scheme == "int4":
        return "W-int4-group-sym-A-bf16-Tpu"
    if scheme == "fp8_block128":
        return "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Tpu"
    if scheme == "mxfp8":
        return "W-mxfp8-A-mxfp8-dynamic-Tpu"
    if scheme == "mxfp6":
        return "W-mxfp6-A-mxfp8-dynamic-Tpu"
    return f"W-{scheme}-channel-sym-A-{scheme}-channel-sym-dynamic-Tpu"


def main():
    p = argparse.ArgumentParser(description="quantize / convert checkpoints")
    p.add_argument("--source", required=True, help="source checkpoint dir (safetensors)")
    p.add_argument("--output", required=True)
    p.add_argument("--quant", choices=["int8", "fp8", "fp8_block128", "int4",
                                       "mxfp8", "mxfp6", "none"], default="int8")
    p.add_argument("--calib_stats", default=None,
                   help="activation-stats .npz from tools/calibrate.py; enables "
                        "smooth-quant (advanced_ptq) output with affine_norm tensors")
    p.add_argument("--smooth_alpha", type=float, default=0.5)
    p.add_argument("--layout", choices=["single", "chunked", "blocks"], default="single")
    p.add_argument("--lora", action="append", default=[], help="path[:strength]")
    args = p.parse_args()

    weights = load_sharded(args.source)
    for spec in args.lora:
        path, _, s = spec.partition(":")
        from ..utils.safetensors_io import load_file

        apply_lora(weights, load_file(path), float(s or 1.0))
    if args.calib_stats:
        from .calibrate import load_stats

        apply_smooth_quant(weights, load_stats(args.calib_stats), args.smooth_alpha)
    if args.quant != "none":
        weights = quantize_model(weights, args.quant)
    save_quantized(weights, args.output, args.layout, None if args.quant == "none" else args.quant,
                   advanced_ptq=bool(args.calib_stats))
    logger.info(f"saved to {args.output}")


if __name__ == "__main__":
    main()
