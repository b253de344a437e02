"""Prompt enhancer (reference: lightx2v/utils/prompt_enhancer.py:29-60 and
the sub-server POST hook in models/runners/default_runner.py:186-200).

Rewrites terse user prompts into detailed video descriptions, either with
a local HF causal LM (Qwen-class) or by POSTing to an enhancer service.
Runs on CPU via torch — once per task, not in the hot loop.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Optional

from .logging_utils import logger

ENHANCE_INSTRUCTION = (
    "Expand the following video prompt into one richly detailed paragraph. "
    "Describe the subjects and their appearance, the motion and actions over "
    "time, the environment and lighting, the camera framing and movement, and "
    "the overall visual style. Keep every element of the original prompt and "
    "do not add text overlays. Reply with the rewritten prompt only.\n\n"
    "Prompt: {}"
)


class PromptEnhancer:
    """Local LM-based enhancer."""

    def __init__(self, model_name: str = "Qwen/Qwen2.5-32B-Instruct", device: str = "cpu"):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForCausalLM.from_pretrained(model_name, torch_dtype="auto").to(device).eval()
        self.device = device

    def __call__(self, prompt: str, max_new_tokens: int = 512) -> str:
        import torch

        messages = [
            {"role": "system", "content": "You are a helpful assistant."},
            {"role": "user", "content": ENHANCE_INSTRUCTION.format(prompt.strip())},
        ]
        text = self.tokenizer.apply_chat_template(messages, tokenize=False, add_generation_prompt=True)
        inputs = self.tokenizer([text], return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=max_new_tokens)
        new_tokens = out[0][inputs.input_ids.shape[1]:]
        result = self.tokenizer.decode(new_tokens, skip_special_tokens=True).strip()
        return result or prompt


def enhance_via_service(prompt: str, url: str, timeout: float = 30.0) -> Optional[str]:
    """POST to an enhancer sub-server (reference default_runner.py:186-200);
    returns None on failure so callers can fall back to the raw prompt."""
    try:
        req = urllib.request.Request(
            url.rstrip("/") + "/v1/enhance",
            data=json.dumps({"prompt": prompt}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read()).get("prompt") or None
    except Exception as e:
        logger.warning(f"prompt enhancer service unavailable: {e}")
        return None
