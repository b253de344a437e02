"""Prompt tokenization: a thin functional layer over HF AutoTokenizer.

The reference carries a tokenizer wrapper class with several cleaning
modes (lightx2v/models/input_encoders/hf/t5/tokenizer.py); the only mode
any model here uses is whitespace normalization of the prompt before the
T5 encoder, so this module is just that: one cleaning function and one
encode function returning padded numpy ids + mask.
"""

from __future__ import annotations

import html
import re
from functools import lru_cache
from typing import List, Sequence, Tuple, Union

import numpy as np

_WS = re.compile(r"\s+")


def clean_prompt(text: str) -> str:
    """Normalize a user prompt: fix mojibake when ftfy is present, unescape
    HTML entities (twice — prompts scraped from the web are often
    double-escaped), and collapse runs of whitespace."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return _WS.sub(" ", text).strip()


@lru_cache(maxsize=4)
def _hf_tokenizer(name_or_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name_or_path)


def encode_prompts(
    tokenizer_path: str,
    prompts: Union[str, Sequence[str]],
    seq_len: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize prompt(s) to fixed-length ``(ids, mask)`` numpy arrays of
    shape (B, seq_len); mask is 1 on real tokens."""
    if isinstance(prompts, str):
        prompts = [prompts]
    tok = _hf_tokenizer(tokenizer_path)
    out = tok(
        [clean_prompt(p) for p in prompts],
        return_tensors="np",
        padding="max_length",
        truncation=True,
        max_length=seq_len,
    )
    return np.asarray(out["input_ids"]), np.asarray(out["attention_mask"])
