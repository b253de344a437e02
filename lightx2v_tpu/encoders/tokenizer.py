"""Tokenizer wrapper (reference: lightx2v/models/input_encoders/hf/t5/
tokenizer.py): HF AutoTokenizer + text cleaning, returning numpy ids/mask
padded to seq_len."""

from __future__ import annotations

import html
import re
import string
from typing import List, Optional, Tuple, Union

import numpy as np


def basic_clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize(text: str, keep_punctuation_exact_string: Optional[str] = None) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    return re.sub(r"\s+", " ", text.lower()).strip()


class HuggingfaceTokenizer:
    def __init__(self, name: str, seq_len: Optional[int] = None, clean: Optional[str] = None, **kwargs):
        assert clean in (None, "whitespace", "lower", "canonicalize")
        from transformers import AutoTokenizer

        self.seq_len = seq_len
        self.clean = clean
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        self.vocab_size = self.tokenizer.vocab_size

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text

    def __call__(self, sequence: Union[str, List[str]], return_mask: bool = False, **kwargs):
        if isinstance(sequence, str):
            sequence = [sequence]
        if self.clean:
            sequence = [self._clean(u) for u in sequence]
        tk_kwargs = {"return_tensors": "np"}
        if self.seq_len is not None:
            tk_kwargs.update(padding="max_length", truncation=True, max_length=self.seq_len)
        tk_kwargs.update(**kwargs)
        out = self.tokenizer(sequence, **tk_kwargs)
        ids = np.asarray(out["input_ids"])
        if return_mask:
            return ids, np.asarray(out["attention_mask"])
        return ids
