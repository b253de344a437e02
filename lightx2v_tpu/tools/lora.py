"""LoRA extraction and merging (reference: tools/extract/lora_extractor.py,
lora_merger.py).

extract: diff two checkpoints -> low-rank (A, B) factors per 2D weight via
truncated SVD, plus full-rank diffs for non-matmul tensors.
merge: fold a LoRA back into a base checkpoint (shared with convert.apply_lora).
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np

from ..utils.logging_utils import logger
from ..utils.safetensors_io import load_sharded, load_file, save_file
from .convert import apply_lora


def extract_lora(
    base: Dict[str, np.ndarray],
    tuned: Dict[str, np.ndarray],
    rank: int = 32,
    threshold: float = 1e-6,
    prefix: str = "diffusion_model.",
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for name, w0 in base.items():
        if name not in tuned:
            continue
        diff = np.asarray(tuned[name], np.float32) - np.asarray(w0, np.float32)
        if np.abs(diff).max() < threshold:
            continue
        if diff.ndim == 2 and min(diff.shape) > rank:
            u, s, vt = np.linalg.svd(diff, full_matrices=False)
            sq = np.sqrt(s[:rank])
            b = (u[:, :rank] * sq).astype(np.float32)         # (out, r)
            a = (sq[:, None] * vt[:rank]).astype(np.float32)  # (r, in)
            key = prefix + name[: -len(".weight")] if name.endswith(".weight") else prefix + name
            out[f"{key}.lora_A.weight"] = a
            out[f"{key}.lora_B.weight"] = b
        elif name.endswith(".bias"):
            out[prefix + name[: -len(".bias")] + ".diff_b"] = diff
        else:
            out[prefix + (name[: -len(".weight")] if name.endswith(".weight") else name) + ".diff"] = diff
    logger.info(f"extracted {len(out)} LoRA tensors")
    return out


def main():
    p = argparse.ArgumentParser(description="LoRA extract / merge")
    sub = p.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract")
    ex.add_argument("--base", required=True)
    ex.add_argument("--tuned", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--rank", type=int, default=32)
    mg = sub.add_parser("merge")
    mg.add_argument("--base", required=True)
    mg.add_argument("--lora", required=True)
    mg.add_argument("--strength", type=float, default=1.0)
    mg.add_argument("--output", required=True)
    args = p.parse_args()

    if args.cmd == "extract":
        lora = extract_lora(load_sharded(args.base), load_sharded(args.tuned), rank=args.rank)
        save_file(lora, args.output)
    else:
        base = load_sharded(args.base)
        apply_lora(base, load_file(args.lora), args.strength)
        save_file(base, args.output)


if __name__ == "__main__":
    main()
